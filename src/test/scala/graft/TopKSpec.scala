package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** Custom GroupedTopK operator vs the WindowExec form it replaces:
  * identical rows and ranks on every input shape that matters. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("score").desc, col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("key", "id", "score", "rn")
  }

  private def customForm(df: org.apache.spark.sql.DataFrame, k: Int) =
    TopK.perKey(df, Seq("key"), Seq("score" -> true, "id" -> false), k)
      .select("key", "id", "score", "rn")

  test("GroupedTopK equals row_number window form on random data") {
    val rng = new scala.util.Random(7)
    val df = (1 to 5000).map(i =>
      (s"k${rng.nextInt(37)}", i.toLong, rng.nextInt(1000).toDouble))
      .toDF("key", "id", "score")
    for (k <- Seq(1, 3, 10)) {
      val a = windowForm(df, k).orderBy("key", "rn").collect()
      val b = customForm(df, k).orderBy("key", "rn").collect()
      assert(a.length === b.length, s"k=$k row count")
      a.zip(b).foreach { case (x, y) => assert(x === y, s"k=$k") }
    }
  }

  test("GroupedTopK: groups smaller than k keep all rows; ties broken by id") {
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("b", 3L, 1.0))
      .toDF("key", "id", "score")
    val out = customForm(df, 5).orderBy("key", "rn").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSeq ===
      Seq(("a", 1L, 1), ("a", 2L, 2), ("b", 3L, 1)))
  }

  test("GroupedTopK plan has no Sort below the operator") {
    val df = (1 to 100).map(i => (s"k${i % 5}", i.toLong, i.toDouble))
      .toDF("key", "id", "score")
    val plan = customForm(df, 2).queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"))
    assert(!plan.split("GroupedTopK")(1).contains("Sort"),
      s"no sort should feed the operator:\n$plan")
  }

  test("GroupedTopK plans a map-side partial prune below the exchange") {
    val df = (1 to 100).map(i => (s"k${i % 5}", i.toLong, i.toDouble))
      .toDF("key", "id", "score")
    val plan = customForm(df, 2).queryExecution.executedPlan.toString
    // two stages with the exchange between them: the partial stage
    // prunes the shuffle input to k rows per key per input partition
    assert("GroupedTopK".r.findAllIn(plan).length === 2, plan)
    val afterFinal = plan.substring(plan.indexOf("GroupedTopK") + 1)
    val exchangeAt = afterFinal.indexOf("Exchange")
    assert(exchangeAt >= 0 &&
      afterFinal.substring(exchangeAt).contains("GroupedTopK"),
      s"expected GroupedTopK(final) -> Exchange -> GroupedTopK(partial):\n$plan")
  }
}
