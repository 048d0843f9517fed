package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink-side layout helpers — the K1 append sink at cluster scale.
  *
  * The analysis table is written partitioned by date: time-range
  * predicates (Q4/Q7/Q9's trailing-window filters) then prune whole
  * directories at planning time (`PartitionFilters` in the scan) instead
  * of reading and filtering 100 TB. Partition column cardinality stays
  * modest (days, not minutes) so the file count is bounded. */
object Sinks {

  /** Append `df` to `path` partitioned by the UTC date of `tsCol`.
    * The day is derived from the epoch directly (`date_from_unix_date`)
    * rather than `to_date`, which silently uses the session timezone —
    * a non-UTC writer session would otherwise shift rows across
    * partition boundaries relative to a UTC reader. */
  def writePartitionedByDate(df: DataFrame, path: String,
      tsCol: String = "window_timestamp"): Unit =
    df.withColumn("part_date",
        date_from_unix_date(expr(s"unix_timestamp($tsCol) div 86400").cast("int")))
      .write.mode("append").partitionBy("part_date").parquet(path)

  /** Read a date-partitioned sink back. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write a shard-assigned training corpus
    * ([[graft.operators.Packing.shardAssign]] columns, optionally
    * joined back to the payload) as exactly one parquet file per
    * (split, shard): repartitioning on the two partition columns puts
    * each shard's rows in a single task, `sortWithinPartitions` keeps
    * them in training order inside the file, and the resulting
    * `split=<s>/shard_id=<n>/` layout is what a training loader lists.
    * One shuffle, no global sort — shard count scales with data while
    * file size stays fixed. */
  def writeTrainingShards(corpus: DataFrame, path: String): Unit =
    corpus
      .repartition(col("split"), col("shard_id"))
      .sortWithinPartitions(col("split"), col("shard_id"), col("split_ord"))
      .write.mode("overwrite").partitionBy("split", "shard_id").parquet(path)
}
