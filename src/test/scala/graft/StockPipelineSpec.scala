package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.StockPipeline

/** Micro-fixture semantics tests per FIXTURES.md §4 — each small enough to
  * verify by hand against the reference behavior
  * (`/root/reference/analysis-dataflow-pipeline/pipeline.py`). */
class StockPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Raw events rows in the testdata schema. */
  private def events(rows: (Long, String, String, Double, String)*): DataFrame =
    rows.toSeq
      .map { case (id, t, typ, v, props) => (id, ts(t), 1L, typ, v, props) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("normalize: decode, NaN/null filter, casts, deterministic enrichment") {
    val df = StockPipeline.normalize(events(
      (0L, "2024-01-01 00:00:10", "A", 10.0, """{"k": 7}"""),
      (1L, "2024-01-01 00:00:20", "A", Double.NaN, """{"k": 8}"""), // NaN price -> drop (main.py:90)
      (2L, "2024-01-01 00:00:30", "A", 12.0, """{}"""),             // no volume -> drop (main.py:91)
      (31L, "2024-01-01 00:00:40", "B", 5.5, """{"k": 2}""")))
    val rows = df.orderBy("ts").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("ticker") === "A")
    assert(rows(0).getAs[Long]("volume") === 7L)
    assert(rows(0).getAs[Double]("ai_sentiment") === -1.0) // (0 % 21 - 10)/10
    assert(rows(1).getAs[Double]("ai_sentiment") === 0.0)  // (31 % 21 - 10)/10
    assert(rows(1).getAs[String]("ai_summary") === "B momentum 0")
  }

  test("agg1m: per (ticker, 1-min window) metrics incl. max_by argmax") {
    val df = StockPipeline.agg1m(StockPipeline.normalize(events(
      (0L, "2024-01-01 00:00:10", "A", 10.0, """{"k": 1}"""),
      (1L, "2024-01-01 00:00:50", "A", 20.0, """{"k": 2}"""),
      (2L, "2024-01-01 00:01:05", "A", 7.0, """{"k": 4}"""),
      (3L, "2024-01-01 00:00:30", "B", 3.0, """{"k": 5}"""))))
    val a = df.filter($"ticker" === "A" &&
      $"window_timestamp" === ts("2024-01-01 00:01:00")).collect().head
    assert(a.getAs[Double]("latest_price") === 20.0)  // argmax ts (pipeline.py:90)
    assert(a.getAs[Double]("high_price_1m") === 20.0)
    assert(a.getAs[Long]("total_volume_1m") === 3L)
    assert(a.getAs[Double]("total_value_1m") === 50.0) // 10*1 + 20*2
    assert(df.count() === 3) // A x2 windows, B x1
  }

  test("ohlc5m: open/close are event-time arg-extremes, bars are " +
      "epoch-aligned 5-min buckets labeled by window end") {
    val df = StockPipeline.ohlc5m(StockPipeline.normalize(events(
      (0L, "2024-01-01 00:01:10", "A", 12.0, """{"k": 1}"""), // open
      (1L, "2024-01-01 00:02:30", "A", 30.0, """{"k": 2}"""), // high
      (2L, "2024-01-01 00:03:40", "A", 5.0, """{"k": 3}"""),  // low
      (3L, "2024-01-01 00:04:50", "A", 18.0, """{"k": 4}"""), // close
      (4L, "2024-01-01 00:05:05", "A", 99.0, """{"k": 5}""")))) // next bar
    val bars = df.orderBy("window_timestamp").collect()
    assert(bars.length === 2)
    val b = bars(0)
    assert(b.getAs[Timestamp]("window_timestamp") === ts("2024-01-01 00:05:00"))
    assert(b.getAs[Double]("open") === 12.0)
    assert(b.getAs[Double]("high") === 30.0)
    assert(b.getAs[Double]("low") === 5.0)
    assert(b.getAs[Double]("close") === 18.0)
    assert(b.getAs[Long]("volume") === 10L)
    assert(b.getAs[Long]("n_events") === 4L)
    assert(bars(1).getAs[Timestamp]("window_timestamp") ===
      ts("2024-01-01 00:10:00"))
  }

  test("sma5m: each event lands in its 5 sliding windows; overlapping means") {
    val df = StockPipeline.sma5m(StockPipeline.normalize(events(
      (0L, "2024-01-01 00:00:30", "A", 10.0, """{"k": 1}"""),
      (1L, "2024-01-01 00:02:30", "A", 20.0, """{"k": 1}"""))))
    val byEnd = df.collect()
      .map(r => r.getAs[Timestamp]("window_timestamp").toString -> r.getAs[Double]("sma_5m"))
      .toMap
    assert(byEnd.size === 7) // ends 00:01..00:05 and 00:03..00:07 union
    assert(byEnd("2024-01-01 00:01:00.0") === 10.0)
    assert(byEnd("2024-01-01 00:03:00.0") === 15.0) // both events
    assert(byEnd("2024-01-01 00:05:00.0") === 15.0)
    assert(byEnd("2024-01-01 00:06:00.0") === 20.0)
  }

  test("join: inner semantics — window ends present on only one side drop") {
    val stock = StockPipeline.normalize(events(
      (0L, "2024-01-01 00:00:30", "A", 10.0, """{"k": 1}""")))
    val j = StockPipeline.joined(stock)
    // agg1m has 1 row (end 00:01); sma5m has 5 (ends 00:01..00:05);
    // inner join keeps only the aligned minute (pipeline.py:112-114).
    assert(j.count() === 1)
    assert(j.collect().head.getAs[Timestamp]("window_timestamp") ===
      ts("2024-01-01 00:01:00"))
  }

  /** Rows of (ticker, minute-index, volume) -> minimal joined-shape df. */
  private def volSeries(ticker: String, vols: Seq[Long]): DataFrame =
    vols.zipWithIndex
      .map { case (v, i) =>
        (ticker, ts(f"2024-01-01 00:${i + 1}%02d:00"), v)
      }
      .toDF("ticker", "window_timestamp", "total_volume_1m")

  test("spike: strict > 2x rule, empty history never spikes (pipeline.py:19-41)") {
    val out = StockPipeline.withSpike(volSeries("A", Seq(10L, 10L, 10L, 10L, 50L)))
      .orderBy("window_timestamp").collect()
    assert(out.map(_.getAs[Boolean]("is_volume_spike")).toSeq ===
      Seq(false, false, false, false, true)) // 50 > 2*10
    assert(out(0).getAs[Double]("hist_avg_volume") === 0.0) // empty history
  }

  test("spike: exactly 2x is NOT a spike (strict >, pipeline.py:33)") {
    val out = StockPipeline.withSpike(volSeries("A", Seq(10L, 20L)))
      .orderBy("window_timestamp").collect()
    assert(out.map(_.getAs[Boolean]("is_volume_spike")).toSeq === Seq(false, false))
  }

  test("spike: history truncated to last 10 (pipeline.py:38-39)") {
    // First value is huge; after 10 subsequent minutes it ages out of the
    // ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING frame, so a 25 spike fires.
    val vols = Seq(1000000L) ++ Seq.fill(10)(10L) ++ Seq(25L)
    val out = StockPipeline.withSpike(volSeries("A", vols))
      .orderBy("window_timestamp").collect()
    assert(out.last.getAs[Double]("hist_avg_volume") === 10.0)
    assert(out.last.getAs[Boolean]("is_volume_spike"))
  }

  test("drawdown: hand-computed peak/trough; underwater minutes counted") {
    // closes 10, 8, 12, 6 -> peaks 10, 10, 12, 12
    // dd = 0, 0.2, 0, 0.5 -> worst 0.5 at minute 4, underwater 2
    val out = StockPipeline.drawdown(StockPipeline.normalize(events(
      (1L, "2024-01-01 00:00:10", "A", 10.0, """{"k": 1}"""),
      (2L, "2024-01-01 00:01:10", "A", 8.0, """{"k": 1}"""),
      (3L, "2024-01-01 00:02:10", "A", 12.0, """{"k": 1}"""),
      (4L, "2024-01-01 00:03:10", "A", 6.0, """{"k": 1}""")))).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Double]("max_drawdown") === 0.5)
    assert(out(0).getAs[Long]("n_underwater") === 2L)
    assert(out(0).getAs[Timestamp]("trough_at") === ts("2024-01-01 00:04:00"))
  }

  test("madOutliers: median/MAD are robust — one wild minute flags " +
      "itself, not the median") {
    // closes 10,10,10,10,100: med 10, devs 0,0,0,0,90, mad 0 ->
    // only the wild minute exceeds 3*MAD (a stddev rule's threshold
    // would be dragged to ~120 by the same point and flag nothing)
    val rows = Seq(10.0, 10.0, 10.0, 10.0, 100.0).zipWithIndex.map {
      case (p, i) => (i.toLong, f"2024-01-01 00:0$i%d:10", "A", p, """{"k": 1}""")
    }
    val out = StockPipeline.madOutliers(
      StockPipeline.normalize(events(rows: _*))).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Double]("med") === 10.0)
    assert(out(0).getAs[Double]("mad") === 0.0)
    assert(out(0).getAs[Long]("n_minutes") === 5L)
    assert(out(0).getAs[Long]("n_outliers") === 1L)
  }

  test("spike: per-ticker state isolation") {
    val df = volSeries("A", Seq(10L, 50L)).union(volSeries("B", Seq(100L, 100L)))
    val out = StockPipeline.withSpike(df).orderBy("ticker", "window_timestamp")
      .collect()
    assert(out.map(r => (r.getAs[String]("ticker"), r.getAs[Boolean]("is_volume_spike"))).toSeq ===
      Seq(("A", false), ("A", true), ("B", false), ("B", false)))
  }
}
