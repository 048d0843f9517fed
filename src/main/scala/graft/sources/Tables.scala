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
  /** `events.ts` has drifted across testdata generations — TIMESTAMP(NANOS)
    * footers (which Spark's vectorized reader only accepts as raw longs via
    * the legacy `nanosAsLong` conf), then TIMESTAMP(MICROS) without a UTC
    * adjustment (which Spark infers as TIMESTAMP_NTZ). The logical contract
    * is simply "a timestamp", so the reader branches on the *loaded* type
    * instead of hard-coding one physical layout:
    *
    *   - `LongType`: `nanosAsLong` fired on a NANOS footer → truncate to
    *     Catalyst's µs precision with `ts div 1000` integer division
    *     (matches the DuckDB oracle's `ts::TIMESTAMP` ns→µs truncation
    *     bit-for-bit; double division would lose precision: epoch-ns ≈
    *     1.7e18 > 2^53) and rebuild the instant with `timestamp_micros`.
    *   - `TimestampNTZType`: a MICROS footer with isAdjustedToUTC=false →
    *     cast to TimestampType. The engine runs with
    *     `spark.sql.session.timeZone=UTC`, so the wall-clock value becomes
    *     the identical UTC instant — same µs value the oracle's naive
    *     `ts::TIMESTAMP` sees.
    *   - `TimestampType`: already an instant — pass through.
    *
    * Downstream operators therefore always see `ts: TimestampType` (UTC),
    * whatever the footer said. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalize an `events`-shaped frame's `ts` column to TimestampType
    * (UTC instant) per the branch table in [[events]]. Shared by the batch
    * reader and the file-stream source so both tolerate the same drift. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts loaded as unsupported type $other — extend Tables.normalizeEventTs")
    }
  }

  /** The raw (pre-normalization) schema Spark resolves for the events
    * parquet at `dir` — file-stream sources need an explicit schema, and
    * hard-coding one is exactly the drift trap [[events]] avoids, so the
    * stream reader asks the batch footer instead. */
  def eventsRawSchema(spark: SparkSession, dir: String): org.apache.spark.sql.types.StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet").schema
  }
  /** `documents`/`embeddings` go through the same drift-tolerance
    * policy the round-5 `events.ts` incident forced on [[events]]:
    * integer WIDTH drift in the footers (an int32 `doc_id`/`n_chars`/
    * `vec_id` from a regenerated testdata writer) is normalized here to
    * the engine contract (long) — both engines compute identically on
    * the widened type, so the 100+ queries over these tables keep
    * their oracle parity. Structural drift — a renamed column, or the
    * embedding ELEMENT type moving float↔double — is deliberately NOT
    * absorbed: a float/double change alters every dot product on both
    * sides and the right response is a human decision, so
    * TablesSchemaSpec pins the loaded schemas and any such
    * regeneration fails ONE focused test naming the drift instead of
    * erroring a third of the roster. */
  def documents(spark: SparkSession, dir: String): DataFrame =
    widenKeysToLong(spark.read.parquet(s"$dir/documents.parquet"),
      "doc_id", "n_chars")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    widenKeysToLong(spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id")

  /** Cast the named columns to LongType iff they loaded as a narrower
    * integral type; anything else passes through untouched. */
  private[graft] def widenKeysToLong(df: DataFrame, cols: String*): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    cols.foldLeft(df) { (d, c) =>
      d.schema.fields.find(_.name == c).map(_.dataType) match {
        case Some(ByteType | ShortType | IntegerType) =>
          d.withColumn(c, col(c).cast(LongType))
        case _ => d
      }
    }
  }
}
