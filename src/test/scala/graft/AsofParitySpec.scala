package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** The bucketed two-level as-of join must equal the single-window
  * (row_number over full history) statement of the semantics at EVERY
  * bucket width — narrow buckets force multi-bucket carries through the
  * summary scan, wide buckets collapse to the in-bucket branch. */
class AsofParitySpec extends SparkSpec {

  private def events: DataFrame =
    graft.sources.Tables.events(spark, "/root/testdata/sf0.001")

  /** The semantics, stated directly: latest click ≤ purchase, ties to
    * the highest event id, over the user's FULL history. */
  private def reference: DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_event"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("c_ts"),
        col("event_id").as("c_event"))
    val w = Window.partitionBy(col("p_event"))
      .orderBy(col("c_ts").desc, col("c_event").desc)
    purchases
      .join(clicks, col("user_id") === col("cu") && col("c_ts") <= col("p_ts"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("p_event"), col("p_ts"),
        col("c_event"), col("c_ts"))
  }

  private def keyed(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("bucketed as-of equals the single-window form at every width") {
    val ref = keyed(reference)
    assert(ref.nonEmpty)
    for (bucketSeconds <- Seq(60L, 3600L, 86400L)) {
      val got = keyed(Relational.asofJoinOn(events, bucketSeconds)
        .select(col("user_id"), col("p_event"), col("p_ts"),
          col("c_event"), col("c_ts")))
      assert(got === ref, s"bucketSeconds=$bucketSeconds")
    }
  }
}
