package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.GroupedTopK

/** Plan-level tests for the RowNumberTopKRewrite optimizer rule: the
  * declarative row_number-over-window + rank-filter pattern must lower
  * to the engine's GroupedTopK node (and keep identical semantics);
  * non-row_number windows must be left alone. */
class RewriteSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1, 10), ("a", 2, 20), ("a", 3, 30),
    ("b", 1, 5), ("b", 2, 15)).toDF("k", "seq", "v")

  private def ranked = df.withColumn("rn",
    row_number().over(Window.partitionBy("k").orderBy(col("v").desc)))

  test("rewrite fires: rn <= k becomes GroupedTopK, Window removed") {
    val q = ranked.filter(col("rn") <= 2)
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect { case g: GroupedTopK => g }.nonEmpty, opt.toString)
    assert(opt.collect { case w: LogicalWindow => w }.isEmpty, opt.toString)
    val rows = q.select("k", "rn", "v").orderBy("k", "rn").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    assert(rows === Seq(("a", 1, 30), ("a", 2, 20), ("b", 1, 15), ("b", 2, 5)))
  }

  test("rewrite fires for rn = k: bounded to k plus equality residual") {
    val q = ranked.filter(col("rn") === 2)
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect { case g: GroupedTopK => g }.exists(_.k === 2), opt.toString)
    assert(opt.collect { case w: LogicalWindow => w }.isEmpty, opt.toString)
    val rows = q.select("k", "v").orderBy("k").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows === Seq(("a", 20), ("b", 5)))
  }

  test("rewrite keeps non-rank conjuncts as a residual filter") {
    val q = ranked.filter(col("rn") <= 2 && col("v") > 10)
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect { case g: GroupedTopK => g }.nonEmpty, opt.toString)
    val rows = q.select("k", "rn", "v").orderBy("k", "rn").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    assert(rows === Seq(("a", 1, 30), ("a", 2, 20), ("b", 1, 15)))
  }

  test("guard: rank() windows are NOT rewritten (ties need WindowExec)") {
    val q = df.withColumn("rk",
        rank().over(Window.partitionBy("k").orderBy(col("v").desc)))
      .filter(col("rk") <= 2)
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect { case g: GroupedTopK => g }.isEmpty, opt.toString)
    assert(opt.collect { case w: LogicalWindow => w }.nonEmpty, opt.toString)
  }

  test("guard: unpartitioned row_number is NOT rewritten") {
    val q = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v").desc)))
      .filter(col("rn") <= 2)
    assert(q.queryExecution.optimizedPlan
      .collect { case g: GroupedTopK => g }.isEmpty)
    assert(q.select("v").collect().map(_.getInt(0)).sorted.toSeq === Seq(20, 30))
  }

  test("SQL surface: QUALIFY-style subquery pattern lowers to GroupedTopK") {
    df.createOrReplaceTempView("rw_t")
    val q = spark.sql("""
      SELECT k, v FROM (
        SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rn
        FROM rw_t) WHERE rn = 1""")
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect { case g: GroupedTopK => g }.nonEmpty, opt.toString)
    val rows = q.orderBy("k").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows === Seq(("a", 30), ("b", 15)))
  }
}
