package graft

/** Roster-wide physical-plan audit: every registered query's executed
  * plan is scanned for the operators that kill clusters at scale.
  *
  *  - `CartesianProduct` (unbroadcast O(n·m) join): never allowed.
  *  - Non-cross `BroadcastNestedLoopJoin` (a non-equi join that streams
  *    one side against a broadcast): allowed only where the build side
  *    is a BOUNDED query set by construction — the brute-force/LSH
  *    similarity probes, whose broadcast side is ≤ nQueries rows
  *    regardless of corpus size. (Cross BNLJ of 1-row scalar aggregates
  *    — injected clocks, bounds, vocab sizes — is the intended
  *    broadcast pattern and not flagged.)
  *
  * A new operator that accidentally plans a quadratic join fails here
  * before it ever reaches the bench.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose INNER nested-loop join is the documented bounded-
    * broadcast probe, not an accident. */
  private val boundedProbeWhitelist = Set(
    "sim_bruteforce_topk", // brute force IS all-pairs: the baseline
    "sim_hard_negatives",  // label-filtered scan vs the 20-query broadcast
    "sim_lsh_topk",        // band0-OR-band1 candidate match vs 20 queries
    "sim_quantized_topk",  // reconstructed-cosine brute force
    "sim_pq_topk",         // ADC scan vs the 20-query broadcast
    "sim_binary_topk",     // hamming scan vs the 20-query broadcast
    "sim_rerank_topk",     // stage-1 ADC scan vs the 20-query broadcast
    "sim_matryoshka",      // 1+|dims| brute-force scans vs 20 queries
    "sim_range_search",    // radius scan vs the 20-query broadcast
    "sim_recall_report",   // composes binary/ivf/ivfpq probes, each the
                           // same ≤ 20-query broadcast as its own row
    "sim_jl_projection",   // fidelity eval scores the brute-force
                           // pairs: same ≤ 20-query broadcast scan as
                           // sim_bruteforce_topk, which it composes
    "sim_quality_separation", // keep/reject centroid pair: both sides
                              // are the TWO-row verdict-centroid agg
    "sim_label_separation") // centroid×centroid pair table: BOTH sides
                            // are the ≤ #labels centroid aggregate —
                            // metadata-sized by construction, the
                            // members scan never joins non-equi

  // Spark 4 prints "BroadcastNestedLoopJoin BuildLeft/BuildRight, <type>"
  // — the build side comes BEFORE the join type (an earlier form of this
  // regex omitted it and never matched anything, making the audit
  // vacuous; pinned by the self-test below).
  private val bnljNonCross =
    "BroadcastNestedLoopJoin Build(Left|Right), (Inner|LeftOuter|RightOuter|LeftSemi|LeftAnti|FullOuter)".r

  test("audit self-test: the BNLJ pattern matches a real non-equi plan") {
    import spark.implicits._
    val a = Seq(1, 2).toDF("a")
    val b = Seq(3, 4).toDF("b")
    val plan = a.join(org.apache.spark.sql.functions.broadcast(b),
      org.apache.spark.sql.functions.col("a") =!=
        org.apache.spark.sql.functions.col("b"))
      .queryExecution.executedPlan.toString
    assert(bnljNonCross.findFirstIn(plan).isDefined, plan)
  }

  test("the RDD API appears only in the whitelisted imperative seams") {
    // The engine is declarative end-to-end: leaving Catalyst via .rdd
    // silently drops codegen + the columnar path for every downstream
    // consumer (round 6 retired the last registered-path hop, the old
    // indexedBars zipWithIndex). The two legitimate exceptions:
    //  - plans/GroupedTopK.scala: a physical operator — SparkPlan's
    //    doExecute contract IS RDD[InternalRow];
    //  - operators/Dedup.scala: the documented single-task union-find
    //    fast path (per-partition imperative state, mapPartitions-shaped).
    val allowed = Set("plans/GroupedTopK.scala", "operators/Dedup.scala")
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val rddUse = """\.rdd\b""".r
    import scala.jdk.CollectionConverters._
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filter { p =>
        val rel = root.relativize(p).toString
        !allowed(rel) &&
          rddUse.findFirstIn(java.nio.file.Files.readString(p)).isDefined
      }
      .map(root.relativize(_).toString).toSeq
    assert(offenders.isEmpty,
      s"unexpected .rdd use (add to whitelist only with a scale argument): " +
        offenders.mkString(", "))
  }

  test("no registered query plans a cartesian or unbounded nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val nonCrossBnlj = bnljNonCross.findFirstIn(plan).isDefined &&
          !boundedProbeWhitelist(name)
        (if (cartesian) Seq(s"$name: CartesianProduct") else Nil) ++
          (if (nonCrossBnlj) Seq(s"$name: unbounded non-equi BNLJ") else Nil)
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
