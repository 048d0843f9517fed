package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's batch SQL analytics surface (Q1–Q10) re-expressed as
  * DataFrame transforms over the 11-column analysis table
  * (`/root/reference/README.md:671-795`, `/root/reference/frontend-app/app.py:28-95`).
  *
  * Conventions shared with the DuckDB oracles (graft.Oracles):
  *   - BigQuery `QUALIFY ROW_NUMBER() … = 1` (README.md:688,762) is not OSS
  *     Spark SQL; planned as the engine's GroupedTopK operator (bounded
  *     per-key heap — no WindowExec sort of each ticker's full history).
  *   - `CURRENT_TIMESTAMP()` predicates (README.md:733,746,792) take an
  *     injected, data-derived clock (`now_ts` = max window end) so results
  *     are deterministic and oracle-verifiable (SURVEY.md §7.4).
  *   - Float aggregates are rounded; Spark's NaN results (stddev_samp of a
  *     single row, corr of a degenerate pair) are normalized to NULL to
  *     agree with ANSI engines.
  *   - Every query ends in a total order (unique tiebreakers) so output is
  *     deterministic under any partitioning.
  *
  * Scale notes: all queries below are single-stage window/agg/top-k plans.
  * ORDER BY + LIMIT lowers to TakeOrderedAndProject (no global sort of the
  * full table); the ticker-partitioned windows shuffle once on a
  * high-cardinality-enough key (at 100 TB the analysis table is also
  * time-partitioned on disk, so the `window_timestamp` range predicates
  * prune partitions before any shuffle).
  */
object Analytics {

  private def nanToNull(c: org.apache.spark.sql.Column) =
    when(isnan(c), lit(null)).otherwise(c)

  /** Latest row per ticker via the engine's own [[graft.plans.GroupedTopK]]
    * operator (bounded per-key heap, no WindowExec partition sort) —
    * semantically `row_number() OVER (PARTITION BY ticker ORDER BY
    * window_timestamp DESC) = 1`, which the oracles still state. */
  private def latestPerTicker(ana: DataFrame): DataFrame =
    TopK.perKey(ana, Seq("ticker"), Seq("window_timestamp" -> true), 1)

  /** Q1 Real-Time Dashboard View — latest row per ticker, ranked by traded
    * value (README.md:679-689). */
  def q1Dashboard(ana: DataFrame): DataFrame =
    latestPerTicker(ana)
      .select("ticker", "latest_price", "total_volume_1m", "total_value_1m",
        "sma_5m", "is_volume_spike", "window_timestamp")
      .orderBy(col("total_value_1m").desc, col("ticker"))

  /** Q2 Trend Analysis — price crossing above SMA (README.md:696-705). */
  def q2TrendSignals(ana: DataFrame): DataFrame =
    ana
      .filter(col("latest_price") > col("sma_5m"))
      .select(col("ticker"), col("latest_price"), col("sma_5m"),
        round(col("latest_price") - col("sma_5m"), 4).as("price_diff"),
        col("window_timestamp"))
      .orderBy(col("window_timestamp").desc, col("ticker"))
      .limit(10)

  /** Q3 Whale Watching — top-5 minutes by traded value (README.md:712-720). */
  def q3Whales(ana: DataFrame): DataFrame =
    ana
      .select("ticker", "total_value_1m", "total_volume_1m", "latest_price",
        "window_timestamp")
      .orderBy(col("total_value_1m").desc, col("ticker"),
        col("window_timestamp"))
      .limit(5)

  /** Q4 Pipeline Health Check — latency stats over the trailing day
    * (README.md:727-733; interval generalized 1 HOUR → 1 DAY to be
    * meaningful on the 30-day test window). Expects a `now_ts` column
    * (StockPipeline.withNow). */
  def q4Health(anaWithNow: DataFrame): DataFrame =
    anaWithNow
      .filter(col("window_timestamp") > col("now_ts") - expr("INTERVAL 1 DAY"))
      .agg(
        round(avg(col("system_latency")), 4).as("avg_latency_seconds"),
        max(col("system_latency")).as("max_latency_seconds"),
        min(col("system_latency")).as("min_latency_seconds"),
        count(lit(1)).as("total_records"))

  /** Q5 Volatility Analysis — stddev/mean ratio per ticker over the
    * trailing half-day (README.md:740-748; 10 MINUTE → 12 HOUR). */
  def q5Volatility(anaWithNow: DataFrame): DataFrame =
    anaWithNow
      .filter(col("window_timestamp") >= col("now_ts") - expr("INTERVAL 12 HOURS"))
      .groupBy(col("ticker"))
      .agg(
        round(nanToNull(stddev_samp(col("latest_price"))), 6).as("price_stddev"),
        round(avg(col("latest_price")), 6).as("avg_price"),
        round(nanToNull(stddev_samp(col("latest_price"))) /
          avg(col("latest_price")) * 100, 6).as("volatility_pct"))
      .orderBy(col("volatility_pct").desc_nulls_last, col("ticker"))

  /** Q6 Momentum Ranking — latest row per ticker, pct distance from SMA
    * (README.md:755-763). */
  def q6Momentum(ana: DataFrame): DataFrame =
    latestPerTicker(ana)
      .select(col("ticker"), col("latest_price"), col("sma_5m"),
        round((col("latest_price") - col("sma_5m")) / col("sma_5m") * 100, 6)
          .as("momentum_pct"),
        col("window_timestamp"))
      .orderBy(col("momentum_pct").desc_nulls_last, col("ticker"))

  /** Q7 Latency Debugging — rows with latency above 30 s (README.md:770-777). */
  def q7LatencySpikes(ana: DataFrame): DataFrame =
    ana
      .filter(col("system_latency") > 30)
      .select("window_timestamp", "system_latency", "ticker", "total_volume_1m")
      .orderBy(col("system_latency").desc, col("ticker"),
        col("window_timestamp"))

  /** Q8 AI Sentiment Analysis — sentiment/price correlation per ticker over
    * the trailing week (README.md:784-794; 1 HOUR → 7 DAYS). */
  def q8Sentiment(anaWithNow: DataFrame): DataFrame =
    anaWithNow
      .filter(col("window_timestamp") >= col("now_ts") - expr("INTERVAL 7 DAYS"))
      .groupBy(col("ticker"))
      .agg(
        round(avg(col("ai_sentiment")), 6).as("avg_sentiment"),
        round(avg(col("latest_price")), 6).as("avg_price"),
        count(lit(1)).as("data_points"),
        round(nanToNull(corr(col("ai_sentiment"), col("latest_price"))), 6)
          .as("sentiment_price_correlation"))
      .orderBy(col("avg_sentiment").desc_nulls_last, col("ticker"))

  /** Q9 Market Overview — most recent 500 rows (app.py:28-36). */
  def q9Overview(ana: DataFrame): DataFrame =
    ana
      // column-minimal per the reference (app.py:29-35): the dashboard
      // reads only these three; projecting first keeps the TakeOrdered
      // heap rows narrow
      .select(col("window_timestamp"), col("ticker"), col("latest_price"))
      .orderBy(col("window_timestamp").desc, col("ticker"))
      .limit(500)

  /** Q10 Ticker drill-down — recent rows for one key (app.py:79-95). */
  def q10Drilldown(ana: DataFrame, ticker: String = "purchase"): DataFrame =
    ana
      .filter(col("ticker") === lit(ticker))
      .orderBy(col("window_timestamp").desc)
      .limit(100)

  /** Q10b Distinct ticker list (app.py:70). */
  def q10Tickers(ana: DataFrame): DataFrame =
    ana.select("ticker").distinct().orderBy("ticker")
}
