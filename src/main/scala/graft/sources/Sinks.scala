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

  /** Append `df` to `path` partitioned by the date of `tsCol`. */
  def writePartitionedByDate(df: DataFrame, path: String,
      tsCol: String = "window_timestamp"): Unit =
    df.withColumn("part_date", to_date(col(tsCol)))
      .write.mode("append").partitionBy("part_date").parquet(path)

  /** Read a date-partitioned sink back. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
