package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.streaming.StreamingPipeline

/** Schema-drift regression tests for the scan layer (round-5 postmortem):
  * the driver regenerates `/root/testdata` between rounds and has already
  * shipped `events.ts` as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS,
  * isAdjustedToUTC=false). The reader's contract is "a timestamp", not one
  * physical layout, so these tests pin the branch table in
  * [[Tables.normalizeEventTs]] against BOTH layouts plus whatever the real
  * testdata currently is.
  */
class TablesSchemaSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("events reader yields TimestampType ts on the real testdata") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.limit(5).count() > 0)
    // ts participates in arithmetic/windowing without a cast error
    val agg = ev.agg(min("ts"), max("ts"), count("*")).head()
    assert(agg.getLong(2) > 0)
  }

  test("all ten tables load with their expected key columns") {
    val expect = Map(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey", "documents" -> "doc_id",
      "embeddings" -> "vec_id")
    val readers: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "region" -> Tables.region, "nation" -> Tables.nation,
      "customer" -> Tables.customer, "supplier" -> Tables.supplier,
      "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem, "documents" -> Tables.documents,
      "embeddings" -> Tables.embeddings)
    for ((name, reader) <- readers) {
      val df = reader(spark, sf)
      assert(df.columns.contains(expect(name)), s"$name missing ${expect(name)}")
      assert(df.limit(1).count() === 1, s"$name is empty")
    }
  }

  test("normalizeEventTs: LongType (nanos) branch truncates ns -> us") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, 1700000000123456789L)),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", LongType))))
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    val micros = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(micros === 1700000000123456L) // integer ns div 1000
  }

  test("normalizeEventTs: TIMESTAMP_NTZ branch is the identical UTC instant") {
    val df = spark.range(1)
      .select(lit(1L).as("event_id"),
        lit("2024-03-01 12:34:56.789012").cast(TimestampNTZType).as("ts"))
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    val micros = out.select(unix_micros(col("ts"))).head().getLong(0)
    // session TZ is UTC, so the wall clock IS the instant
    val expected = java.time.LocalDateTime
      .parse("2024-03-01T12:34:56.789012")
      .toInstant(java.time.ZoneOffset.UTC)
    assert(micros === expected.getEpochSecond * 1000000L + expected.getNano / 1000L)
  }

  test("normalizeEventTs: TimestampType passes through unchanged") {
    val df = spark.range(1).select(current_timestamp().as("ts"))
    assert(Tables.normalizeEventTs(df).schema("ts").dataType === TimestampType)
  }

  test("eventsStream resolves its schema from the footer and normalizes ts") {
    val stream = StreamingPipeline.eventsStream(spark, sf)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType === TimestampType)
    assert(stream.columns.toSet ===
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
  }
}
