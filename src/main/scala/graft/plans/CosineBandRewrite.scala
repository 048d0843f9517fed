package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Alias, And, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, If, IntegralDivide, LessThan, LessThanOrEqual, Literal, Not, Remainder, Round}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct
import graft.operators.Similarity

/** Optimizer rule: an inner join whose condition demands
  * `graft_dot(a, b) >= t` (the cosine of pre-unitized vectors, plain or
  * rounded) across the two sides is an all-pairs similarity join — at
  * scale, the O(n²) plan that kills a cluster. When the user opts in
  * (`spark.graft.lsh.approxRewrite=true` — "approx" in the name because
  * the rewrite changes results), rewrite it to the
  * signed-random-projection banded join the engine's own
  * [[graft.operators.Similarity.nearDupPairs]] uses: compute each
  * side's 16-bit SRP signature, join on band agreement (8-bit band 0,
  * else band 1), and keep the ORIGINAL predicate as the exact verify —
  * so every emitted row satisfies the user's condition bit-for-bit and
  * appears exactly once (the band-1 branch excludes band-0 matches, so
  * the two branches are disjoint).
  *
  * This is an APPROXIMATE rewrite by contract: pairs agreeing on
  * neither band are never verified. At cosine c each SRP bit agrees
  * with probability 1 − arccos(c)/π (≈ 0.857 at c = 0.9, ≈ 0.50 recall
  * for band0-OR-band1) — which is why it only fires behind the explicit
  * conf flag, the same recall trade every LSH pipeline opts into.
  * Production tuning is more/narrower bands; the plan shape is
  * unchanged.
  *
  * Guards: inner join; one conjunct is `dot >= t` (or `round(dot, _) >=
  * t`, or the flipped `t <= dot`) with one argument per side; the plan
  * was not already rewritten (no `__graft_sig` reference). The vector
  * dimension cannot be read from the unresolved type, so it comes from
  * `spark.graft.lsh.dim` (default 64 — the embeddings table).
  */
object CosineBandJoinRewrite extends Rule[LogicalPlan] {

  val enabledKey = "spark.graft.lsh.approxRewrite"
  val dimKey = "spark.graft.lsh.dim"
  private val sigName = "__graft_sig"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** The dot expression inside a `cosine >= t` conjunct, if any. */
  private def dotOf(e: Expression): Option[DotProduct] = e match {
    case GreaterThanOrEqual(d, Literal(_, DoubleType)) => bareDot(d)
    case GreaterThan(d, Literal(_, DoubleType)) => bareDot(d)
    case LessThanOrEqual(Literal(_, DoubleType), d) => bareDot(d)
    case LessThan(Literal(_, DoubleType), d) => bareDot(d)
    case _ => None
  }

  private def bareDot(e: Expression): Option[DotProduct] = e match {
    case d: DotProduct => Some(d)
    case r: Round => bareDot(r.child)
    case _ => None
  }

  /** 16-bit SRP signature of `v` as a raw Catalyst expression — the
    * same planes (same universal-hash weights) as
    * [[Similarity.srpSignature]], so a plan rewritten here buckets
    * identically to the hand-written banded operators. */
  private def sigExpr(v: Expression, dim: Int): Expression =
    Similarity.srpPlaneWeights(dim).zipWithIndex.map { case (w, j) =>
      If(GreaterThan(DotProduct(v, Literal.create(w.toSeq,
          ArrayType(DoubleType))), Literal(0.0)),
        Literal(1L << j), Literal(0L)): Expression
    }.reduce(Add(_, _))

  private def band0(sig: Attribute): Expression =
    Remainder(sig, Literal(256L))
  private def band1(sig: Attribute): Expression =
    IntegralDivide(sig, Literal(256L))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(enabledKey, "false").toBoolean) return plan
    val dim = conf.getConfString(dimKey, "64").toInt
    plan.transform {
      case j @ Join(l, r, Inner, Some(cond), hint)
          if !cond.exists {
            case a: AttributeReference => a.name == sigName
            case _ => false
          } =>
        val sides = conjuncts(cond).flatMap(dotOf).collectFirst {
          case DotProduct(a, b)
              if a.references.subsetOf(l.outputSet) &&
                b.references.subsetOf(r.outputSet) => (a, b)
          case DotProduct(a, b)
              if a.references.subsetOf(r.outputSet) &&
                b.references.subsetOf(l.outputSet) => (b, a)
        }
        sides match {
          case Some((lVec, rVec)) =>
            logWarning(s"$enabledKey: rewriting all-pairs cosine join to " +
              "an APPROXIMATE SRP-banded join (recall < 1; e.g. ~0.50 of " +
              s"qualifying pairs at cosine 0.9). Join condition: $cond")
            val lSig = Alias(sigExpr(lVec, dim), sigName)()
            val rSig = Alias(sigExpr(rVec, dim), sigName)()
            val lp = Project(l.output :+ lSig, l)
            val rp = Project(r.output :+ rSig, r)
            val (ls, rs) = (lSig.toAttribute, rSig.toAttribute)
            val b0 = EqualTo(band0(ls), band0(rs))
            val j0 = Join(lp, rp, Inner, Some(And(b0, cond)), hint)
            val j1 = Join(lp, rp, Inner,
              Some(And(And(EqualTo(band1(ls), band1(rs)), Not(b0)), cond)),
              hint)
            val out = (l.output ++ r.output).map(a => a: Attribute)
            Union(Project(out, j0), Project(out, j1))
          case None => j
        }
    }
  }
}
