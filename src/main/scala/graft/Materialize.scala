package graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** The engine's single materialization seam — every operator that cuts
  * lineage / pins a reused intermediate calls `.pin(...)` from here
  * instead of `Dataset.localCheckpoint` directly.
  *
  * Why a seam: `localCheckpoint` stores blocks on executors with NO
  * replication and NO recompute path (lineage is truncated). On
  * `local[n]` and on a healthy long-lived cluster that is the cheapest
  * correct choice; on a 1000-executor cluster with preemptible /
  * autoscaled executors, one lost executor fails the whole job. The
  * cluster operator flips ONE switch instead of auditing ~40 call
  * sites:
  *
  *   - `-Dgraft.materialize.mode=local` (default): executor-block
  *     `localCheckpoint` — zero-infra, fastest.
  *   - `-Dgraft.materialize.mode=reliable`: `Dataset.checkpoint` to the
  *     SparkContext checkpoint dir (HDFS/object store in production —
  *     set `spark.checkpoint.dir` or call `setCheckpointDir`; a local
  *     temp dir is auto-provisioned if unset so the mode is testable
  *     anywhere). Survives executor loss; costs one write+read of the
  *     pinned frame.
  *
  * Both modes produce bit-identical results (MaterializeSpec proves it
  * on the iterative CC chain) — the choice is purely a
  * fault-tolerance/cost trade. Iterative operators (big-star CC,
  * k-means, PageRank) MUST pin each round whatever the mode: without a
  * lineage cut the plan doubles per iteration.
  */
object Materialize {
  val modeProp = "graft.materialize.mode"
  private def mode: String = sys.props.getOrElse(modeProp, "local")

  implicit class PinOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** Materialize this frame as the configured mode's checkpoint.
      * `eager = false` defers the job to the first downstream action
      * (use when the frame might not be consumed on every path). */
    def pin(eager: Boolean = false): Dataset[T] = mode match {
      case "reliable" =>
        val sc = ds.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(
            java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
        ds.checkpoint(eager)
      case _ => ds.localCheckpoint(eager)
    }
  }
}
