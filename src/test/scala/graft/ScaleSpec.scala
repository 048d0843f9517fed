package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Tables

/** Scale-technique specs: salted joins preserve semantics; bucketed
  * tables co-locate joins (no shuffle exchange in the plan). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // 10k rows of one hot key + a long tail, joined to a small dim
    val large = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong)))
      .toDF("key", "row_id")
    val small = (Seq(("hot", 1.0)) ++ (1 to 100).map(i => (s"k$i", i / 10.0)))
      .toDF("key", "weight")
    val plain = large.join(small, Seq("key"), "inner")
      .select("key", "row_id", "weight")
    val salted = Skew.saltedJoin(large, small, "key", col("row_id"), 8)
      .select("key", "row_id", "weight")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    Tables.orders(spark, dir).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
    Tables.customer(spark, dir).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    // and it still computes the right thing
    val expected = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() === expected)
  }
}
