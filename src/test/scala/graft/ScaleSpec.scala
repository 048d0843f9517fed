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

  test("SRP band buckets co-locate the near-dup self-join (no shuffle)") {
    // the Similarity scale claim, demonstrated concretely: persist the
    // banded signature table bucketed by (band, key) and the candidate
    // self-join runs shuffle-free — at cluster scale the banding column
    // IS the physical layout, not just a logical join key
    val dir = "/root/testdata/sf0.001"
    val sig = graft.operators.Similarity
      .unitized(Tables.embeddings(spark, dir))
      .withColumn("sig", graft.operators.Similarity.srpSignature(col("unit")))
      .select(col("vec_id"), col("unit"),
        explode(array(
          struct(lit(0).as("band"), (col("sig") % 256).as("key")),
          struct(lit(1).as("band"), expr("sig div 256").as("key")))).as("bb"))
      .select(col("vec_id"), col("unit"),
        col("bb.band").as("band"), col("bb.key").as("key"))
    spark.sql("DROP TABLE IF EXISTS banded_b")
    sig.write.bucketBy(8, "band", "key").saveAsTable("banded_b")
    // disable broadcast: tiny test data would broadcast and pass the
    // no-shuffle assertion vacuously — the claim is about the
    // shuffle-join family consuming bucketed layout
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val b = spark.table("banded_b")
      val pairs = b.as("a").join(b.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join over bucketed layout:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"banded self-join over bucketed table should not shuffle:\n$plan")
      // same candidate set as the unbucketed plan
      val expected = sig.as("a").join(sig.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.vec_id") < col("b.vec_id")).count()
      assert(pairs.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
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
