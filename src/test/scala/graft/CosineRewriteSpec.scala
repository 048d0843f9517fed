package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join => LogicalJoin, Union => LogicalUnion}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.plans.CosineBandJoinRewrite

/** Plan- and value-level tests for CosineBandJoinRewrite: an all-pairs
  * cosine-threshold join rewrites (behind the opt-in flag) to the
  * SRP-banded disjoint-branch union, keeps the original predicate as
  * the exact verify, and emits exactly the pairs the hand-written
  * banded operator would admit. */
class CosineRewriteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def unit: DataFrame =
    Similarity.unitized(graft.sources.Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("unit"))

  /** The naive all-pairs plan a user writes. */
  private def naive(u: DataFrame, threshold: Double): DataFrame = {
    val a = u.select(col("vec_id").as("id_a"), col("unit").as("ua"))
    val b = u.select(col("vec_id").as("id_b"), col("unit").as("ub"))
    a.join(b, col("id_a") < col("id_b") &&
        Similarity.dot(col("ua"), col("ub")) >= threshold)
      .select("id_a", "id_b")
  }

  /** The base set plus exact copies of the 4 lowest vec_ids under
    * shifted ids. A copy shares its source's SRP signature (band 0
    * agrees) and has dot = 1.0, so the banded expectation is non-empty
    * by construction — sf0.001 alone has no qualifying pair at 0.5 and
    * would leave the value check vacuous. */
  private def withDups(u: DataFrame): DataFrame = {
    val dups = u.orderBy("vec_id").limit(4)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    u.unionByName(dups)
  }

  private def withFlag[T](on: Boolean)(body: => T): T = {
    spark.conf.set(CosineBandJoinRewrite.enabledKey, on.toString)
    try body finally spark.conf.unset(CosineBandJoinRewrite.enabledKey)
  }

  test("flag off: the all-pairs join is left untouched") {
    val opt = naive(unit, 0.5).queryExecution.optimizedPlan
    assert(opt.collect { case u: LogicalUnion => u }.isEmpty, opt.toString)
    assert(!opt.toString.contains("__graft_sig"), opt.toString)
  }

  test("flag on: plan becomes a two-branch banded union of equi-joins") {
    withFlag(on = true) {
      val opt = naive(unit, 0.5).queryExecution.optimizedPlan
      assert(opt.collect { case u: LogicalUnion => u }.nonEmpty, opt.toString)
      assert(opt.toString.contains("__graft_sig"), opt.toString)
      val joins = opt.collect { case j: LogicalJoin => j }
      assert(joins.size === 2, opt.toString)
      // both joins carry a band-equality conjunct -> planned as hash or
      // sort-merge equi-joins, never a nested-loop cross product
      val phys = naive(unit, 0.5).queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
      assert(!phys.contains("CartesianProduct"), phys)
    }
  }

  test("flag on: values equal the hand-banded candidates, verified exactly") {
    val threshold = 0.5
    val u = withDups(unit)
    // hand-built expectation: pairs agreeing on band0 OR band1 of the
    // same SRP signature, with the exact dot >= t check on survivors
    val sig = u
      .withColumn("sig", Similarity.srpSignature(col("unit")))
      .withColumn("b0", col("sig") % 256)
      .withColumn("b1", expr("sig div 256"))
    val a = sig.select(col("vec_id").as("id_a"), col("unit").as("ua"),
      col("b0").as("a0"), col("b1").as("a1"))
    val b = sig.select(col("vec_id").as("id_b"), col("unit").as("ub"),
      col("b0").as("c0"), col("b1").as("c1"))
    val expected = a.join(b, col("id_a") < col("id_b") &&
        (col("a0") === col("c0") || col("a1") === col("c1")) &&
        Similarity.dot(col("ua"), col("ub")) >= threshold)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = withFlag(on = true) {
      naive(u, threshold).collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(got.length === got.toSet.size, "banded branches must be disjoint")
    assert(got.toSet === expected)
    assert(expected.nonEmpty) // the fixture actually exercises the path
    // and the rewrite admits only rows the naive plan admits
    val naiveSet = naive(u, threshold).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet.subsetOf(naiveSet))
  }
}
