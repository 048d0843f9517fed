package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** Catalyst extension entry point: registers the engine's custom
  * expressions with the SQL function registry so `spark.sql` users get
  * them too (not just the Column API).
  *
  * Wire up either way:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Also injects the [[graft.plans.RowNumberTopKRewrite]] optimizer rule:
  * the declarative `row_number() OVER (...) <= k` pattern is rewritten
  * to the engine's bounded-heap [[graft.plans.GroupedTopK]] operator.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator custom plan: GroupedTopK -> GroupedTopKExec
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    // optimizer rewrite: row_number-over-window + rank filter -> GroupedTopK
    ext.injectOptimizerRule(_ => graft.plans.RowNumberTopKRewrite)
    // opt-in (spark.graft.lsh.approxRewrite) rewrite: all-pairs
    // cosine-threshold join -> SRP-banded equi-join + exact verify
    ext.injectOptimizerRule(_ => graft.plans.CosineBandJoinRewrite)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(args.head, args(1))
      }))
  }
}
