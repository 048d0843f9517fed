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
    "sim_label_separation", // centroid×centroid pair table: BOTH sides
                            // are the ≤ #labels centroid aggregate —
                            // metadata-sized by construction, the
                            // members scan never joins non-equi
    "rel_mann_kendall")     // i<j pair table over the calendar-month
                            // revenue grid: BOTH sides are the ~80-row
                            // month aggregate — metadata-sized at any
                            // SF, the orders scan never joins non-equi

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

  /** Grouping keys the engine declares BOUNDED by construction — a
    * fixed grid whose cardinality does not grow with the data. An
    * aggregate grouped solely on these keys emits a metadata-sized
    * frame, so a global window over it is the documented two-level-
    * scan exception (exclusivePrefix / bandedRank pattern), not a
    * scale-killer. Add a key only with a boundedness argument:
    *  - bucket/__bucket/band: equal-width band grids (≤ nBands/nBuckets)
    *  - decile: the fixed 10-row lift/gains grid
    *  - month: calendar months in the data's date range
    *  - duration: distinct customer lifetimes in days (date-range bound)
    *  - df: document-frequency histogram values (≤ df cap)
    *  - hamming: pHash Hamming distances (≤ 65)
    *  - z: z-order curve values (≤ 4^zorderBits)
    *
    * This is a NAMING CONTRACT, not a proof: the audit trusts that
    * these column names are reserved for bounded grids engine-wide
    * (true cardinality lives in the operator, which the audit can't
    * see). Never reuse a listed name for a data-sized grouping key —
    * an unbounded per-user "bucket" would silently pass; conversely an
    * anonymous bounded grouping (inline expression →
    * `_groupingexpression`) FAILS until materialized as a named
    * column, which is the intended pressure (see monthlyGrowth).
    */
  private val boundedGroupKeys = Set(
    "bucket", "__bucket", "band", "decile", "month", "duration", "df",
    "hamming", "z", "level")

  test("no registered query plans an unpartitioned Window over an " +
      "unbounded input (global windows single-task the data at scale)") {
    import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

    // A window input is BOUNDED iff every data path below it passes
    // through a limit or a bounded-grid (or scalar) aggregate before
    // reaching a scan. Broadcast build sides are bounded by the
    // engine's broadcast discipline (scalar aggs / probe sets — the
    // BNLJ audit below owns that claim), so joins descend the
    // streamed/ non-broadcast children only.
    def bounded(p: SparkPlan): Boolean = p match {
      case _: TakeOrderedAndProjectExec => true
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.LocalLimitExec => true
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
        h.groupingExpressions.isEmpty ||
          h.groupingExpressions.forall(g => boundedGroupKeys(g.name))
      case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
        s.groupingExpressions.isEmpty ||
          s.groupingExpressions.forall(g => boundedGroupKeys(g.name))
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
        o.groupingExpressions.isEmpty ||
          o.groupingExpressions.forall(g => boundedGroupKeys(g.name))
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        val dataKids = j.children.filterNot {
          case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => true
          case q: QueryStageExec => q.plan.isInstanceOf[
            org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]
          case _ => false
        }
        dataKids.forall(bounded)
      case a: AdaptiveSparkPlanExec => bounded(a.executedPlan)
      case q: QueryStageExec => bounded(q.plan)
      case leaf if leaf.children.isEmpty => false // scans: data-sized
      case other => other.children.forall(bounded) // pass-through
    }

    def offendingWindows(p: SparkPlan): Seq[String] = {
      val here = p match {
        case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
          Seq("Window[" +
            w.windowExpression.map(_.name).mkString(",").take(60) + "]")
        case g: WindowGroupLimitExec
            if g.partitionSpec.isEmpty && !bounded(g.child) =>
          Seq("WindowGroupLimit")
        case _ => Nil
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      here ++ (kids ++ p.subqueries).flatMap(offendingWindows)
    }

    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val hits = offendingWindows(
          fn(spark, dir).queryExecution.executedPlan)
        if (hits.isEmpty) Nil else Seq(s"$name: ${hits.mkString("; ")}")
    }
    assert(offenders.isEmpty,
      "unpartitioned Window over an unbounded input (rewrite with the " +
        "two-level band scan, or pre-limit): " + offenders.mkString(" | "))
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
