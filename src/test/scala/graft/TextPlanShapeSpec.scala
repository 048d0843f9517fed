package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowGroupLimitExec

import graft.operators.TextAnalysis
import graft.sources.Tables

/** Round-11 plan contract for [[TextAnalysis.headCoverage]]: the
  * per-language rank must never sort a language's full type inventory
  * — the rank filter sits directly on the `row_number`, so the
  * engine's [[graft.plans.GroupedTopK]] rewrite replaces the window
  * with a bounded two-stage top-k (map-side partial prune to
  * max(HeadKs) rows per task BEFORE the shuffle, final per-language
  * top-k after). A web corpus's vocabulary is unbounded; this asserts
  * the plan itself carries the bound, not just that the small test
  * data happens to fit. */
class TextPlanShapeSpec extends SparkSpec {

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    p +: (kids ++ p.subqueries).flatMap(collectPlans)
  }

  test("headCoverage plans a bounded per-language top-k of max(HeadKs) " +
      "— no task sorts a full vocabulary, and no window remains") {
    val df = TextAnalysis.headCoverage(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    df.collect() // execute so AQE finalizes the plan
    val plans = collectPlans(df.queryExecution.executedPlan)
    val topks = plans.collect { case g: graft.plans.GroupedTopKExec => g }
    assert(topks.nonEmpty,
      "expected a GroupedTopK under the rank — the rank<=max(HeadKs) " +
        "filter no longer sits directly on the row_number")
    // both stages must be present: the map-side partial prune is what
    // bounds the SHUFFLE, not just the final sort
    assert(topks.exists(_.partial) && topks.exists(!_.partial),
      s"expected partial+final GroupedTopK stages, got ${topks}")
    topks.foreach { g =>
      assert(g.k === TextAnalysis.HeadKs.max,
        s"group limit ${g.k} != max(HeadKs) ${TextAnalysis.HeadKs.max}")
      assert(g.partitionExprs.nonEmpty,
        "the top-k must be per-language (partitioned), not global")
    }
    // and nothing else windows anything: the totals stage is pure hash
    // aggregation, the rank window was consumed by the rewrite
    val windows = plans.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
      case w: WindowGroupLimitExec => w
    }
    assert(windows.isEmpty,
      s"unexpected window stages: ${windows.map(_.nodeName)}")
  }
}
