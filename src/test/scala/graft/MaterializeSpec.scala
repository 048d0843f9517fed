package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** The materialization seam's cluster story: `-Dgraft.materialize
  * .mode=reliable` must route every pin through a RELIABLE checkpoint
  * (survives executor loss) and produce bit-identical results to the
  * default executor-block mode. Proven on the most checkpoint-heavy
  * chain in the engine (MinHash pairs → iterative CC). */
class MaterializeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def clustersRows(): Seq[(Long, Long)] =
    Dedup.clustersBigStar(Dedup.minhashPairs(Tables.documents(spark, dir)))
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq

  test("reliable mode is bit-identical to local mode on the CC chain " +
      "and actually writes reliable checkpoints") {
    val local = clustersRows()
    val prev = sys.props.get(Materialize.modeProp)
    sys.props(Materialize.modeProp) = "reliable"
    try {
      val reliable = clustersRows()
      assert(reliable === local)
      // the mode really engaged: a checkpoint dir was provisioned and
      // holds RDD checkpoint data from the run
      val ckptDir = spark.sparkContext.getCheckpointDir
      assert(ckptDir.isDefined, "reliable pin must provision a checkpoint dir")
      val root = new java.io.File(new java.net.URI(ckptDir.get).getPath)
        .getParentFile // per-app subdir lives under the provisioned root
      def hasRddDir(f: java.io.File): Boolean =
        f.isDirectory && (f.getName.startsWith("rdd-") ||
          Option(f.listFiles()).exists(_.exists(hasRddDir)))
      assert(hasRddDir(root),
        s"expected rdd-* checkpoint data under $root")
    } finally {
      prev match {
        case Some(v) => sys.props(Materialize.modeProp) = v
        case None => sys.props.remove(Materialize.modeProp)
      }
    }
  }
}
