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

  test("documents loads with the pinned engine schema (drift canary)") {
    // The r5 incident was events.ts; the same regeneration trap exists
    // here. If this test fails after a testdata refresh, the FOOTER
    // drifted: integer-width drift is already absorbed by
    // Tables.widenKeysToLong, so a failure means structural drift
    // (renamed column / re-typed text) that needs a human decision.
    val df = Tables.documents(spark, sf)
    val expected = Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    expected.foreach { case (name, dt) =>
      assert(df.schema(name).dataType === dt,
        s"documents.$name loaded as ${df.schema(name).dataType}, engine " +
          s"contract is $dt — testdata footer drifted")
    }
  }

  test("embeddings loads with the pinned engine schema incl. float elements " +
      "(drift canary)") {
    val df = Tables.embeddings(spark, sf)
    assert(df.schema("vec_id").dataType === LongType)
    assert(df.schema("label").dataType === IntegerType)
    // The element type is pinned ON PURPOSE: a float↔double footer
    // change alters every dot product (Spark AND the DuckDB oracle),
    // and silently casting would hide a corpus-wide numeric shift —
    // surface it here as one focused failure instead.
    assert(df.schema("embedding").dataType === ArrayType(FloatType),
      s"embeddings.embedding loaded as ${df.schema("embedding").dataType}; " +
        "the engine's cosine/PQ paths are verified against array<float> — " +
        "decide the cast policy before touching the sim_* roster")
  }

  test("widenKeysToLong: int32 footers normalize to the long contract") {
    val narrow = spark.createDataFrame(
      java.util.Arrays.asList(Row(7, "abc", 3)),
      StructType(Seq(StructField("doc_id", IntegerType),
        StructField("text", StringType),
        StructField("n_chars", IntegerType))))
    val out = Tables.widenKeysToLong(narrow, "doc_id", "n_chars")
    assert(out.schema("doc_id").dataType === LongType)
    assert(out.schema("n_chars").dataType === LongType)
    assert(out.schema("text").dataType === StringType)
    val r = out.head()
    assert(r.getLong(0) === 7L && r.getLong(2) === 3L)
    // absent columns and already-long columns are left untouched
    assert(Tables.widenKeysToLong(out, "doc_id", "missing")
      .schema === out.schema)
  }

  test("TPC-H fact/dimension tables load with pinned column types " +
      "(drift canary for the 50+ relational queries)") {
    def types(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val li = types(Tables.lineitem(spark, sf))
    assert(li("l_orderkey") === "bigint" && li("l_partkey") === "bigint" &&
      li("l_suppkey") === "bigint")
    assert(li("l_quantity") === "double" &&
      li("l_extendedprice") === "double" && li("l_discount") === "double" &&
      li("l_tax") === "double",
      s"money columns must stay double (decimal-cast convention): $li")
    // either instant or NTZ is fine: the session runs UTC, so literal
    // comparisons coerce to the identical µs values in both cases
    val tsKinds = Set("timestamp", "timestamp_ntz")
    assert(tsKinds(li("l_shipdate")), li.toString)
    val o = types(Tables.orders(spark, sf))
    assert(o("o_orderkey") === "bigint" && o("o_custkey") === "bigint" &&
      o("o_totalprice") === "double" && tsKinds(o("o_orderdate")))
    val p = types(Tables.part(spark, sf))
    assert(p("p_partkey") === "bigint" && p("p_retailprice") === "double")
    val c = types(Tables.customer(spark, sf))
    // nationkey may be any integral width — every use is an equi join
    // against the same-width nation key, where coercion is lossless
    assert(c("c_custkey") === "bigint" &&
      Set("int", "bigint")(c("c_nationkey")) && c("c_name") === "string")
  }

  test("eventsStream resolves its schema from the footer and normalizes ts") {
    val stream = StreamingPipeline.eventsStream(spark, sf)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType === TimestampType)
    assert(stream.columns.toSet ===
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
  }
}
