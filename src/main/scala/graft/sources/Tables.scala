package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet readers for the driver-provided test tables
  * (`/root/repo/TESTDATA.md`). One method per table; every operator in the
  * engine takes its input through here so the scan layer is a single seam
  * (at cluster scale these become partitioned/bucketed catalog tables —
  * the readers are the only place that would change).
  *
  * Scale note: `spark.read.parquet` gives Catalyst the native vectorized
  * parquet source, so filter pushdown + column pruning + partition pruning
  * all apply automatically to everything built on top.
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(s"$dir/region.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(s"$dir/nation.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame      = spark.read.parquet(s"$dir/part.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(s"$dir/orders.parquet")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/lineitem.parquet")
  /** `events.ts` is TIMESTAMP(NANOS) in the parquet footer, which Spark's
    * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw
    * nanos (legacy conf) and truncate to the microsecond precision of
    * Catalyst's TimestampType — `div 1000` integer division matches the
    * DuckDB oracle's `ts::TIMESTAMP` ns→µs truncation bit-for-bit
    * (double division would lose precision: epoch-ns ≈ 1.7e18 > 2^53). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")
}
