package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `row_number() OVER (PARTITION BY p ORDER BY o)`
  * followed by a rank-limit filter (`rn <= k`, `rn < k`, `rn = k`, or
  * the flipped literal forms) is a grouped top-k — rewrite it to the
  * engine's [[GroupedTopK]] node so the plan is a bounded per-key heap
  * instead of WindowExec's full partition sort.
  *
  * This is the declarative contract at work: users (and the engine's
  * own operators) state the standard SQL QUALIFY-style pattern; the
  * optimizer picks the physical strategy that survives 100 TB. The
  * rewrite fires in the extended-operator-optimization batch, i.e.
  * before Spark's own InferWindowGroupLimit, and removes the Window
  * node entirely.
  *
  * Scope guards (all must hold, else leave the plan untouched):
  *   - the Window computes exactly ONE window expression, a RowNumber
  *     (any other function, or a second expression, needs WindowExec);
  *   - the partition spec is non-empty (global top-k is ORDER BY+LIMIT,
  *     which Spark already lowers to TakeOrderedAndProject);
  *   - the filter bounds that row_number by a positive integer literal.
  * Conjuncts other than the rank bound stay as a residual Filter above
  * the node; an `rn = k` bound keeps its equality predicate too.
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] {

  /** (limit implied by this conjunct, keep conjunct as residual?) */
  private def rankBound(e: Expression, rn: Attribute): Option[(Int, Boolean)] = {
    def lit(l: Literal): Option[Int] = l.value match {
      case i: Int => Some(i)
      case l2: Long if l2 <= Int.MaxValue && l2 >= Int.MinValue => Some(l2.toInt)
      case _ => None
    }
    e match {
      case LessThanOrEqual(a: Attribute, l: Literal) if a.semanticEquals(rn) =>
        lit(l).map(k => (k, false))
      case LessThan(a: Attribute, l: Literal) if a.semanticEquals(rn) =>
        lit(l).map(k => (k - 1, false))
      case GreaterThanOrEqual(l: Literal, a: Attribute) if a.semanticEquals(rn) =>
        lit(l).map(k => (k, false))
      case GreaterThan(l: Literal, a: Attribute) if a.semanticEquals(rn) =>
        lit(l).map(k => (k - 1, false))
      case EqualTo(a: Attribute, l: Literal) if a.semanticEquals(rn) =>
        lit(l).map(k => (k, true))
      case EqualTo(l: Literal, a: Attribute) if a.semanticEquals(rn) =>
        lit(l).map(k => (k, true))
      case _ => None
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // !isStreaming: GroupedTopKExec is a batch operator (Spark rejects
    // non-time windows on streams anyway — this is belt and braces)
    case f @ Filter(cond, w: Window)
        if !w.isStreaming && w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(part, order, _)), _) if part.nonEmpty =>
          val rn = alias.toAttribute
          val parts = conjuncts(cond).map(c => (c, rankBound(c, rn)))
          val bounds = parts.flatMap(_._2.map(_._1))
          if (bounds.isEmpty || bounds.min <= 0) f
          else {
            val k = bounds.min
            val residual = parts.collect {
              case (c, None) => c
              case (c, Some((_, true))) => c
            }
            val topk = GroupedTopK(part, order, k, rn, w.child)
            if (residual.isEmpty) topk
            else Filter(residual.reduce(And), topk)
          }
        case _ => f
      }
  }
}
