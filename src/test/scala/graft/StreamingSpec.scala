package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.StockPipeline
import graft.sources.Tables
import graft.streaming.{SpikeState, StreamingPipeline, VolumeRow}

case class RawEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Stream/batch parity tests (SURVEY.md §5.4): the same transforms run
  * under MemoryStream must produce exactly the batch results. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: String, typ: String, v: Double, k: Long) =
    RawEvent(id, Timestamp.valueOf(t), 1L, typ, v, s"""{"k": $k}""")

  test("agg1m: streaming append output equals batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val real = Seq(
      ev(1, "2024-01-01 00:00:10", "A", 10.0, 1),
      ev(2, "2024-01-01 00:00:50", "A", 20.0, 2),
      ev(3, "2024-01-01 00:01:30", "A", 15.0, 3),
      ev(4, "2024-01-01 00:00:40", "B", 5.0, 7))
    val stream = MemoryStream[RawEvent]
    val agg = StreamingPipeline.agg1mStream(
      StreamingPipeline.withEventTime(stream.toDF()))
    val q = agg.writeStream.format("memory").queryName("agg1m_sink")
      .outputMode("append").start()
    try {
      stream.addData(real: _*)
      q.processAllAvailable()
      // two sentinel batches push the watermark past all real windows
      stream.addData(ev(98, "2024-01-01 01:00:00", "Z", 1.0, 1))
      q.processAllAvailable()
      stream.addData(ev(99, "2024-01-01 02:00:00", "Z", 1.0, 1))
      q.processAllAvailable()
      val streamed = spark.table("agg1m_sink")
        .filter(col("ticker") =!= "Z")
        .orderBy("ticker", "window_timestamp").collect()
      val batch = StockPipeline.agg1m(StockPipeline.normalize(real.toDF()))
        .orderBy("ticker", "window_timestamp").collect()
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("spike: flatMapGroupsWithState across micro-batches equals batch window frame") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val agg = StockPipeline.agg1m(
        StockPipeline.normalize(Tables.events(spark, dir)))
      .select("ticker", "window_timestamp", "total_volume_1m")
    val rows = agg.as[VolumeRow].collect().sortBy(_.window_timestamp.getTime)
    // feed in 3 consecutive chunks so state genuinely carries across batches
    val chunks = rows.grouped(math.max(rows.length / 3, 1)).toSeq
    val stream = MemoryStream[VolumeRow]
    val q = SpikeState.detect(stream.toDS()).writeStream
      .format("memory").queryName("spike_sink").outputMode("append").start()
    try {
      chunks.foreach { c => stream.addData(c.toSeq: _*); q.processAllAvailable() }
      val streamed = spark.table("spike_sink")
        .select("ticker", "window_timestamp", "hist_avg_volume", "is_volume_spike")
        .orderBy("ticker", "window_timestamp").collect()
      val batch = StockPipeline.withSpike(agg)
        .select("ticker", "window_timestamp", "hist_avg_volume", "is_volume_spike")
        .orderBy("ticker", "window_timestamp").collect()
      assert(streamed.length === batch.length)
      streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
    } finally q.stop()
  }

  test("full streaming analysis sink writes spike-annotated rows end-to-end") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val q = StreamingPipeline.analysisSink(spark, "/root/testdata/sf0.001",
      s"$tmp/out", s"$tmp/ckpt")
    try {
      q.processAllAvailable()
      val out = spark.read.parquet(s"$tmp/out")
      assert(out.count() > 0)
      assert(out.columns.contains("is_volume_spike"))
    } finally q.stop()
  }
}
