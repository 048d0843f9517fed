package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types._

/** S1 production analog: the Kafka-shaped unbounded source (the engine's
  * stand-in for the reference's Pub/Sub subscription,
  * `analysis-dataflow-pipeline/pipeline.py:77`).
  *
  * Split in two so the sandbox (no broker, no kafka connector jar) still
  * exercises everything except the socket:
  *
  *   - [[reader]]/[[writerOptions]] build the production `format("kafka")`
  *     configuration — subscribe pattern, offsets, fail-on-data-loss; on
  *     a cluster with `spark-sql-kafka-0-10` on the classpath,
  *     `reader(...).load()` + [[decode]] is the whole ingest path.
  *   - [[decode]]/[[encode]] are pure DataFrame transforms between
  *     Kafka's fixed record schema (key/value binary, topic, partition,
  *     offset, timestamp) and the engine's raw events schema, over the
  *     reference's JSON wire format (`stock-ingestion-function/
  *     main.py:162-172`) — broker-independent, parity-tested to be a
  *     lossless round trip, and shared verbatim by MemoryStream tests.
  *
  * Scale notes: decode is map-side only (JSON parse + casts); source
  * parallelism is Kafka partition count, and the key (= event_type) is
  * the producer-side partitioner, so per-ticker ordering is preserved
  * per partition — the property the windowed aggregation's watermark
  * relies on. */
object KafkaSource {

  /** Kafka's fixed source schema, as `format("kafka")` emits it. */
  val kafkaRecordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** JSON wire format of one raw event (reference `main.py:162-172`;
    * `props` is carried as its raw JSON string, exactly like the
    * warehouse table stores it). */
  val wireSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", StringType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Production reader config — call `.load()` where the kafka connector
    * is on the classpath, then [[decode]]. */
  def reader(spark: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "latest"): DataStreamReader =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", "false")

  /** Production sink options for the publish side (K2): key by ticker so
    * per-ticker order is preserved within a partition. */
  def writerOptions(bootstrapServers: String, topic: String): Map[String, String] =
    Map("kafka.bootstrap.servers" -> bootstrapServers, "topic" -> topic)

  /** Kafka records (JSON wire in `value`) → the raw events schema.
    * Timestamps round-trip at microsecond precision. */
  def decode(kafka: DataFrame): DataFrame =
    kafka
      .select(from_json(col("value").cast("string"), wireSchema).as("e"))
      .select(
        col("e.event_id").as("event_id"),
        to_timestamp(col("e.ts")).as("ts"),
        col("e.user_id").as("user_id"),
        col("e.event_type").as("event_type"),
        col("e.value").as("value"),
        col("e.props").as("props"))

  /** Raw events → Kafka-record-shaped rows (the producer twin of
    * [[decode]]; key = event_type, the partitioner). */
  def encode(events: DataFrame): DataFrame =
    events.select(
      col("event_type").cast("binary").as("key"),
      to_json(struct(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props")))
        .cast("binary").as("value"),
      lit("graft-events").as("topic"),
      // test stand-in ONLY: real Kafka producers ignore a supplied
      // partition column — broker-side assignment is murmur2 over the
      // key bytes, not this Spark murmur3 value. Kept so the wire
      // schema round-trips deterministically in tests.
      pmod(hash(col("event_type")), lit(32)).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("ts").as("timestamp"),
      lit(0).as("timestampType"))
}
