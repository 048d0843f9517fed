package graft

/** DuckDB oracle SQL for every entry in SparkEntry.queries (driver
  * contract: the driver executes these over views named after the parquet
  * tables in the same sf directory and hash-compares with the Spark
  * result, columns sorted by name).
  *
  * Shared conventions with the Spark side (see graft.operators.*):
  * deterministic injected clock (max window end), rounded float
  * aggregates, identical output column names, total ORDER BY on every
  * query. `ts::TIMESTAMP` truncates the parquet ns timestamps to the
  * microsecond precision Spark uses, so event-time values agree bit-wise.
  */
object Oracles {

  /** The normalized stock feed — the oracle twin of
    * StockPipeline.normalize (decode P1/P2/P5/P6 + enrichment stub U1). */
  val stockCte: String = """
WITH stock AS (
  SELECT
    event_type AS ticker,
    ts::TIMESTAMP AS ts,
    value::DOUBLE AS price,
    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS volume,
    (event_id % 21 - 10) / 10.0 AS ai_sentiment,
    event_type || ' momentum ' || CAST(event_id % 21 - 10 AS VARCHAR) AS ai_summary
  FROM events
  -- TRY_CAST matches Spark's null-on-miss get_json_object(...).cast:
  -- a non-numeric props.k is DROPPED by both engines, not an error
  WHERE value IS NOT NULL AND NOT isnan(value)
    AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
),
agg1m AS (
  SELECT
    ticker,
    date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_timestamp,
    max_by(price, ts) AS latest_price,
    max(price) AS high_price_1m,
    CAST(sum(volume) AS BIGINT) AS total_volume_1m,
    round(sum(price * volume), 4) AS total_value_1m,
    max_by(ai_sentiment, ts) AS ai_sentiment,
    max_by(ai_summary, ts) AS ai_summary
  FROM stock GROUP BY 1, 2
),
sma5m AS (
  -- exact DECIMAL(38,18) mean with VARCHAR crossings (a double avg is
  -- accumulation-order-dependent across engines) and the VARCHAR-round
  -- that reproduces Spark's half-up round(x, 4) bit-for-bit
  SELECT
    ticker,
    date_trunc('minute', ts) + i * INTERVAL 1 MINUTE AS window_timestamp,
    CAST(CAST(CAST(CAST(
      CAST(CAST(sum(CAST(CAST(price AS VARCHAR) AS DECIMAL(38,18)))
        AS VARCHAR) AS DOUBLE) / count(*)
      AS VARCHAR) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sma_5m
  FROM stock, (SELECT unnest([1, 2, 3, 4, 5]) AS i)
  GROUP BY 1, 2
),
joined AS (
  SELECT a.*, s.sma_5m
  FROM agg1m a JOIN sma5m s USING (ticker, window_timestamp)
),
spiked AS (
  SELECT *,
    coalesce(avg(total_volume_1m) OVER (
      PARTITION BY ticker ORDER BY window_timestamp
      ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING), 0.0) AS hist_avg_volume
  FROM joined
),
spike AS (
  SELECT *,
    (total_volume_1m > 2.0 * hist_avg_volume AND hist_avg_volume > 0.0)
      AS is_volume_spike
  FROM spiked
),
ana AS (
  SELECT ticker, window_timestamp, latest_price, high_price_1m,
    total_volume_1m, total_value_1m, sma_5m, is_volume_spike,
    CAST(epoch(n.now_ts) - epoch(window_timestamp) AS DOUBLE) AS system_latency,
    ai_sentiment, ai_summary
  FROM spike CROSS JOIN (SELECT max(window_timestamp) AS now_ts FROM spike) n
),
ana_now AS (
  SELECT a.*, n.now_ts
  FROM ana a CROSS JOIN (SELECT max(window_timestamp) AS now_ts FROM ana) n
)
"""

  val stock: Map[String, String] = Map(
    "stock_normalize" -> (stockCte +
      "SELECT ticker, ts, price, volume, ai_sentiment, ai_summary FROM stock ORDER BY ts, ticker"),
    // the batched-seam path states the identical contract
    "stock_enrich_batched" -> (stockCte +
      "SELECT ticker, ts, price, volume, ai_sentiment, ai_summary FROM stock ORDER BY ts, ticker"),
    "stock_agg_1m" -> (stockCte +
      "SELECT * FROM agg1m ORDER BY ticker, window_timestamp"),
    "stock_sma_5m" -> (stockCte +
      "SELECT * FROM sma5m ORDER BY ticker, window_timestamp"),
    // OHLCV candlestick resample: 5-min tumbling bars, window END label
    // (epoch-aligned — date_trunc to the minute + the minutes remaining
    // in the 5-min bucket); open/close via the same min_by/max_by(ts)
    // single-pass argmax convention as agg1m
    // robust median/MAD outliers: two exact-percentile passes, both
    // medians rounded to the 6dp grid BEFORE the 3xMAD comparison
    "stock_mad_outliers" -> (stockCte + """,
mm AS (SELECT ticker, window_timestamp, latest_price FROM agg1m),
md AS (
  SELECT ticker, round(quantile_cont(latest_price, 0.5)::DOUBLE, 6) AS med
  FROM mm GROUP BY ticker),
dv AS (
  SELECT mm.ticker AS ticker, med, abs(latest_price - med) AS dev
  FROM mm JOIN md ON mm.ticker = md.ticker),
md2 AS (
  SELECT ticker, round(quantile_cont(dev, 0.5)::DOUBLE, 6) AS mad
  FROM dv GROUP BY ticker)
SELECT dv.ticker AS ticker, med, mad,
  count(*)::BIGINT AS n_minutes,
  sum(CASE WHEN dev > mad * 3 THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM dv JOIN md2 ON dv.ticker = md2.ticker
GROUP BY dv.ticker, med, mad
ORDER BY dv.ticker"""),
    // max drawdown: running-peak ROWS window over the minute closes,
    // max-row join-back on the ROUNDED drawdown, min-timestamp tie rule
    "stock_drawdown" -> (stockCte + """,
dd AS (
  SELECT ticker, window_timestamp,
    round((max(latest_price) OVER w - latest_price)
      / max(latest_price) OVER w, 6) AS dd
  FROM agg1m
  WINDOW w AS (PARTITION BY ticker ORDER BY window_timestamp
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
m AS (
  SELECT ticker, max(dd) AS max_drawdown,
    sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END)::BIGINT AS n_underwater
  FROM dd GROUP BY ticker)
SELECT m.ticker AS ticker, max_drawdown, n_underwater,
  min(window_timestamp) AS trough_at
FROM m JOIN dd ON m.ticker = dd.ticker AND dd.dd = m.max_drawdown
GROUP BY m.ticker, max_drawdown, n_underwater
ORDER BY m.ticker"""),
    "stock_ohlc_5m" -> (stockCte + """
SELECT ticker,
  date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
    AS window_timestamp,
  min_by(price, ts) AS open,
  max(price) AS high,
  min(price) AS low,
  max_by(price, ts) AS close,
  CAST(sum(volume) AS BIGINT) AS volume,
  count(*)::BIGINT AS n_events
FROM stock GROUP BY 1, 2 ORDER BY ticker, window_timestamp"""),
    "stock_join" -> (stockCte +
      "SELECT * FROM joined ORDER BY ticker, window_timestamp"),
    "stock_spike" -> (stockCte +
      "SELECT ticker, window_timestamp, total_volume_1m, hist_avg_volume, is_volume_spike FROM spike ORDER BY ticker, window_timestamp"),
    "stock_analysis" -> (stockCte +
      "SELECT * FROM ana ORDER BY ticker, window_timestamp"),
    "q1_dashboard" -> (stockCte + """
SELECT ticker, latest_price, total_volume_1m, total_value_1m, sma_5m,
       is_volume_spike, window_timestamp
FROM ana
QUALIFY ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY window_timestamp DESC) = 1
ORDER BY total_value_1m DESC, ticker"""),
    "q2_trend_signals" -> (stockCte + """
SELECT ticker, latest_price, sma_5m,
       round(latest_price - sma_5m, 4) AS price_diff, window_timestamp
FROM ana
WHERE latest_price > sma_5m
ORDER BY window_timestamp DESC, ticker
LIMIT 10"""),
    "q3_whales" -> (stockCte + """
SELECT ticker, total_value_1m, total_volume_1m, latest_price, window_timestamp
FROM ana
ORDER BY total_value_1m DESC, ticker, window_timestamp
LIMIT 5"""),
    "q4_health" -> (stockCte + """
SELECT round(avg(system_latency), 4) AS avg_latency_seconds,
       max(system_latency) AS max_latency_seconds,
       min(system_latency) AS min_latency_seconds,
       count(*) AS total_records
FROM ana_now
WHERE window_timestamp > now_ts - INTERVAL 1 DAY"""),
    "q5_volatility" -> (stockCte + """
SELECT ticker,
       round(stddev(latest_price), 6) AS price_stddev,
       round(avg(latest_price), 6) AS avg_price,
       round(stddev(latest_price) / avg(latest_price) * 100, 6) AS volatility_pct
FROM ana_now
WHERE window_timestamp >= now_ts - INTERVAL 12 HOUR
GROUP BY ticker
ORDER BY volatility_pct DESC NULLS LAST, ticker"""),
    "q6_momentum" -> (stockCte + """
SELECT ticker, latest_price, sma_5m,
       round((latest_price - sma_5m) / sma_5m * 100, 6) AS momentum_pct,
       window_timestamp
FROM ana
QUALIFY ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY window_timestamp DESC) = 1
ORDER BY momentum_pct DESC NULLS LAST, ticker"""),
    "q7_latency_spikes" -> (stockCte + """
SELECT window_timestamp, system_latency, ticker, total_volume_1m
FROM ana
WHERE system_latency > 30
ORDER BY system_latency DESC, ticker, window_timestamp"""),
    "q8_sentiment" -> (stockCte + """
SELECT ticker,
       round(avg(ai_sentiment), 6) AS avg_sentiment,
       round(avg(latest_price), 6) AS avg_price,
       count(*) AS data_points,
       round(corr(ai_sentiment, latest_price), 6) AS sentiment_price_correlation
FROM ana_now
WHERE window_timestamp >= now_ts - INTERVAL 7 DAY
GROUP BY ticker
ORDER BY avg_sentiment DESC NULLS LAST, ticker"""),
    "q9_overview" -> (stockCte + """
SELECT window_timestamp, ticker, latest_price FROM ana
ORDER BY window_timestamp DESC, ticker LIMIT 500"""),
    "q10_drilldown" -> (stockCte + """
SELECT * FROM ana WHERE ticker = 'purchase'
ORDER BY window_timestamp DESC LIMIT 100"""),
    "q10_tickers" -> (stockCte + """
SELECT DISTINCT ticker FROM ana ORDER BY ticker"""),
    // W4 session windows: gaps-and-islands twin of Spark's
    // session_window (new session when gap >= 1800 s; end = last + gap).
    "stock_sessions" -> (stockCte + """,
brk AS (
  SELECT ticker, ts, price,
    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (
      PARTITION BY ticker ORDER BY ts)) >= 1800 THEN 1 ELSE 0 END AS brk
  FROM stock),
sid AS (
  SELECT ticker, ts, price,
    sum(brk) OVER (PARTITION BY ticker ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM brk)
SELECT ticker, min(ts) AS session_start,
  max(ts) + INTERVAL 30 MINUTE AS session_end,
  count(*) AS n_events,
  CAST(CAST(sum(CAST(price AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price
FROM sid GROUP BY ticker, sid
ORDER BY ticker, session_start"""),
    // Long->wide pivot of the minute aggregation (pinned ticker columns).
    "stock_pivot" -> (stockCte + """
SELECT window_timestamp,
  max(CASE WHEN ticker = 'click' THEN latest_price END) AS click,
  max(CASE WHEN ticker = 'error' THEN latest_price END) AS error,
  max(CASE WHEN ticker = 'purchase' THEN latest_price END) AS purchase,
  max(CASE WHEN ticker = 'signup' THEN latest_price END) AS signup,
  max(CASE WHEN ticker = 'view' THEN latest_price END) AS view
FROM agg1m GROUP BY window_timestamp ORDER BY window_timestamp"""),
    // dead-letter accounting: identical wire construction + hash-selected
    // truncation; ok <=> the corrupted message still parses as JSON
    "stock_dead_letter" -> """
WITH w AS (
  SELECT event_type,
    '{"event_id":' || event_id::VARCHAR || ',"type":"' || event_type || '"}' AS msg0,
    ('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT AS h
  FROM events),
c AS (SELECT event_type,
    CASE WHEN h % 11 = 0 THEN substr(msg0, 1, length(msg0) - 2)
         ELSE msg0 END AS msg
  FROM w)
SELECT event_type,
  sum(CASE WHEN json_valid(msg) THEN 1 ELSE 0 END)::BIGINT AS n_ok,
  sum(CASE WHEN json_valid(msg) THEN 0 ELSE 1 END)::BIGINT AS n_dead
FROM c GROUP BY event_type ORDER BY event_type""",
    // pivot -> unpivot recovers the long table exactly: the oracle is
    // the plain minute aggregate, proving the round-trip is the identity
    "stock_unpivot" -> (stockCte + """
SELECT window_timestamp, ticker, latest_price
FROM agg1m ORDER BY window_timestamp, ticker"""),
    // JSON wire-format round-trip is lossless -> oracle is the identity.
    "stock_json_roundtrip" -> (stockCte + """
SELECT ticker, ts, price, volume, ai_sentiment, ai_summary
FROM stock ORDER BY ts, ticker"""),
    // replay generator schedule: tick t plays bar t mod n in (ts,
    // event_id) order — the oracle recomputes the contiguous index
    // with row_number, independently of the engine's distributed
    // zipWithIndex construction
    // The modulo is PROJECTED onto the tick axis before the join: with
    // the scalar subquery inside the join predicate DuckDB planned a
    // BLOCKWISE_NL_JOIN (9M ticks x 6M bars at sf10 -- unfinishable);
    // as a projected column the join is a plain hash equi-join on
    // midx = idx. Same schedule by construction.
    "stock_replay" -> """
WITH b AS (
  SELECT event_id, event_type, user_id,
    (row_number() OVER (ORDER BY ts, event_id) - 1)::BIGINT AS idx
  FROM events),
n AS (SELECT count(*)::BIGINT AS cnt FROM events),
t AS (
  SELECT unnest(range((SELECT cnt * 3 // 2 FROM n)))::BIGINT AS tick),
tm AS (SELECT tick, tick % (SELECT cnt FROM n) AS midx FROM t)
SELECT tick, idx, event_id, event_type, user_id
FROM tm JOIN b ON midx = idx
ORDER BY tick""",
  )

  /** All oracles, by query name. Extended by the relational / text /
    * dedup / similarity sections as they land. */
  def all: Map[String, String] =
    stock ++ OraclesExt.all ++ OraclesRel.all ++ OraclesCuration.all ++
      OraclesPacking.all ++ OraclesTs.all
}
