package graft

/** DuckDB oracle SQL for the time-series surface
  * ([[graft.operators.TimeSeries]]). The EWMA kernel SQL is GENERATED
  * from the same Scala constants the Spark side uses — each `(1-α)^i`
  * weight is interpolated via `Double.toString` (shortest round-trip
  * repr), so both engines parse the bit-identical IEEE double, and the
  * `+` chains are stated in the same textual order as the Scala
  * `reduce(_ + _)` left fold, so the summation order agrees too. */
object OraclesTs {

  /** VARCHAR-mediated DECIMAL(38,18) sum — the oracle twin of the
    * engine's `dsum18` that stays correct at ANY magnitude: the
    * VARCHAR hops reproduce Spark's shortest-repr double↔decimal
    * casts where DuckDB's direct casts float-scale (1e5+ band). */
  private def vsum18(x: String): String =
    s"CAST(CAST(sum(CAST(CAST($x AS VARCHAR) AS DECIMAL(38,18)))" +
      " AS VARCHAR) AS DOUBLE)"

  /** Oracle twin of StockPipeline.normalize ∘ TimeSeries.closeBars5m:
    * the sparse per-ticker 5-minute close bars. `make_timestamp(µs)`
    * builds a naive TIMESTAMP (no session-timezone dependency, unlike
    * `to_timestamp`), matching Spark's `timestamp_seconds` instant. */
  private val barsCte: String = """
WITH stock AS (
  SELECT event_type AS ticker, ts::TIMESTAMP AS ts,
    value::DOUBLE AS price
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
    AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL),
bars AS (
  SELECT ticker,
    make_timestamp((epoch_us(ts::TIMESTAMP) // 300000000) * 300000000)
      AS bucket,
    max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2)"""

  /** The generated span-12 EWMA kernel: `CASE` guards state the same
    * null-contributes-zero-weight semantics as the Spark lag-chain. */
  private val ewmaKernel: String = {
    val span = 12
    val alpha = 2.0 / (span + 1)
    val decay = 1.0 - alpha
    val terms = (0 until span).map { i =>
      val w = math.pow(decay, i).toString
      (s"CASE WHEN lag(close, $i) OVER tw IS NOT NULL" +
        s" THEN lag(close, $i) OVER tw * $w ELSE 0.0 END",
        s"CASE WHEN lag(close, $i) OVER tw IS NOT NULL" +
          s" THEN CAST($w AS DOUBLE) ELSE 0.0 END")
    }
    val num = terms.map(_._1).mkString("(", " + ", ")")
    val den = terms.map(_._2).mkString("(", " + ", ")")
    s"round($num / $den, 6)"
  }

  /** Generated RSI kernel — same lag-chain/textual-order discipline as
    * [[ewmaKernel]], span shared with the Spark side. */
  private val rsiKernel: String = {
    val span = graft.operators.TimeSeries.RsiSpan
    def chain(term: Int => String) =
      (0 until span).map(term).mkString("(", " + ", ")")
    val g = chain(i => s"CASE WHEN lag(diff, $i) OVER tw IS NOT NULL" +
      s" THEN greatest(lag(diff, $i) OVER tw, 0.0) ELSE 0.0 END")
    val l = chain(i => s"CASE WHEN lag(diff, $i) OVER tw IS NOT NULL" +
      s" THEN greatest(-lag(diff, $i) OVER tw, 0.0) ELSE 0.0 END")
    val c = chain(i => s"CASE WHEN lag(diff, $i) OVER tw IS NOT NULL" +
      " THEN 1 ELSE 0 END")
    s"CASE WHEN $c = 0 THEN NULL WHEN $l = 0.0 THEN 100.0" +
      s" ELSE round(100.0 * $g / ($g + $l), 6) END"
  }

  /** Generalized truncated-EWMA kernel over any column/span — the
    * [[ewmaKernel]] generator parameterized the way the Spark side's
    * `TimeSeries.ewmaKernel` is; weights interpolate via
    * `Double.toString` and the `+` chains keep the Scala fold's
    * textual order, so both engines parse bit-identical doubles and
    * sum in the same order. Returns the UNROUNDED `(num / den)`. */
  private def genEwma(c: String, span: Int): String = {
    val alpha = 2.0 / (span + 1)
    val decay = 1.0 - alpha
    val terms = (0 until span).map { i =>
      val w = math.pow(decay, i).toString
      (s"CASE WHEN lag($c, $i) OVER tw IS NOT NULL" +
        s" THEN lag($c, $i) OVER tw * $w ELSE 0.0 END",
        s"CASE WHEN lag($c, $i) OVER tw IS NOT NULL" +
          s" THEN CAST($w AS DOUBLE) ELSE 0.0 END")
    }
    val num = terms.map(_._1).mkString("(", " + ", ")")
    val den = terms.map(_._2).mkString("(", " + ", ")")
    s"($num / $den)"
  }

  /** Generated %D smoothing sums (num, den) for the stochastic
    * oscillator — [[StochSmooth]]-term lag-chain over `k_raw`. */
  private val (stochNum, stochDen) = {
    val span = graft.operators.TimeSeries.StochSmooth
    def chain(term: Int => String) =
      (0 until span).map(term).mkString("(", " + ", ")")
    (chain(i => s"CASE WHEN lag(k_raw, $i) OVER tw IS NOT NULL" +
      s" THEN lag(k_raw, $i) OVER tw ELSE 0.0 END"),
      chain(i => s"CASE WHEN lag(k_raw, $i) OVER tw IS NOT NULL" +
        " THEN 1 ELSE 0 END"))
  }

  /** Generated Bollinger kernel sums (n, Σx, Σx²) — shared-span
    * lag-chain, same discipline as [[rsiKernel]]. */
  private val (bollN, bollSx, bollSxx) = {
    val span = graft.operators.TimeSeries.BollSpan
    def chain(term: Int => String) =
      (0 until span).map(term).mkString("(", " + ", ")")
    (chain(i => s"CASE WHEN lag(close, $i) OVER tw IS NOT NULL" +
      " THEN 1 ELSE 0 END"),
      chain(i => s"CASE WHEN lag(close, $i) OVER tw IS NOT NULL" +
        s" THEN lag(close, $i) OVER tw ELSE 0.0 END"),
      chain(i => s"CASE WHEN lag(close, $i) OVER tw IS NOT NULL" +
        s" THEN lag(close, $i) OVER tw * lag(close, $i) OVER tw" +
        " ELSE 0.0 END"))
  }

  private val macdSignalSql =
    genEwma("macd_raw", graft.operators.TimeSeries.MacdSignal)

  /** Generated rolling-correlation kernel sums (n, Σx, Σy, Σxy, Σx²,
    * Σy²) — shared-span lag-chains over the joint return series. */
  private val (rcN, rcSx, rcSy, rcSxy, rcSxx, rcSyy) = {
    val span = graft.operators.TimeSeries.RollCorrSpan
    def chain(term: Int => String) =
      (0 until span).map(term).mkString("(", " + ", ")")
    def nn(c: String, i: Int) = s"lag($c, $i) OVER tw IS NOT NULL"
    (chain(i => s"CASE WHEN ${nn("ret_a", i)} THEN 1 ELSE 0 END"),
      chain(i => s"CASE WHEN ${nn("ret_a", i)}" +
        s" THEN lag(ret_a, $i) OVER tw ELSE 0.0 END"),
      chain(i => s"CASE WHEN ${nn("ret_b", i)}" +
        s" THEN lag(ret_b, $i) OVER tw ELSE 0.0 END"),
      chain(i => s"CASE WHEN ${nn("ret_a", i)}" +
        s" THEN lag(ret_a, $i) OVER tw * lag(ret_b, $i) OVER tw" +
        " ELSE 0.0 END"),
      chain(i => s"CASE WHEN ${nn("ret_a", i)}" +
        s" THEN lag(ret_a, $i) OVER tw * lag(ret_a, $i) OVER tw" +
        " ELSE 0.0 END"),
      chain(i => s"CASE WHEN ${nn("ret_b", i)}" +
        s" THEN lag(ret_b, $i) OVER tw * lag(ret_b, $i) OVER tw" +
        " ELSE 0.0 END"))
  }

  /** Generated ATR smoothing sums — shared-span lag-chain over tr. */
  private val (atrNum, atrDen) = {
    val span = graft.operators.TimeSeries.AtrSpan
    def chain(term: Int => String) =
      (0 until span).map(term).mkString("(", " + ", ")")
    (chain(i => s"CASE WHEN lag(tr, $i) OVER tw IS NOT NULL" +
      s" THEN lag(tr, $i) OVER tw ELSE 0.0 END"),
      chain(i => s"CASE WHEN lag(tr, $i) OVER tw IS NOT NULL" +
        " THEN 1 ELSE 0 END"))
  }

  val all: Map[String, String] = Map(
    // Donchian channel: pure max/min lag-chains (greatest/least skip
    // NULLs on both engines), one identical midpoint division
    "stock_donchian" -> (Oracles.stockCte + {
      val span = graft.operators.TimeSeries.DonchianSpan
      def ch(c: String, f: String): String = (0 until span).map {
        case 0 => c
        case i => s"lag($c, $i) OVER tw"
      }.mkString(s"$f(", ", ", ")")
      s""",
ohlc AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    max(price) AS high, min(price) AS low, max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2),
ch AS (
  SELECT ticker, window_timestamp, close,
    ${ch("high", "greatest")} AS dcu,
    ${ch("low", "least")} AS dcd
  FROM ohlc
  WINDOW tw AS (PARTITION BY ticker ORDER BY window_timestamp))
SELECT ticker, window_timestamp, close,
  round(dcu, 6) AS dc_up, round(dcd, 6) AS dc_dn,
  round((dcu + dcd) / 2.0, 6) AS dc_mid
FROM ch ORDER BY ticker, window_timestamp"""
    }),
    // ADX: Wilder directional system as two-level lag-chains — DM/TR
    // per bar, trailing DI sums, DX spread, trailing-mean ADX; every
    // ratio tier NULL-divisor-guarded like the Spark kernel
    "stock_adx" -> (Oracles.stockCte + {
      val span = graft.operators.TimeSeries.AdxSpan
      def lg(c: String, i: Int): String =
        if (i == 0) c else s"lag($c, $i) OVER tw2"
      def chain(c: String): String = (0 until span).map(i =>
        s"CASE WHEN ${lg(c, i)} IS NOT NULL THEN ${lg(c, i)} ELSE 0.0 END")
        .mkString(" + ")
      def cnt(c: String): String = (0 until span).map(i =>
        s"CASE WHEN ${lg(c, i)} IS NOT NULL THEN 1 ELSE 0 END")
        .mkString(" + ")
      s""",
ohlc AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    max(price) AS high, min(price) AS low, max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2),
b1 AS (
  SELECT ticker, window_timestamp,
    CASE WHEN lag(high, 1) OVER tw IS NOT NULL THEN
      CASE WHEN (high - lag(high, 1) OVER tw) >
                (lag(low, 1) OVER tw - low)
            AND (high - lag(high, 1) OVER tw) > 0.0
        THEN high - lag(high, 1) OVER tw ELSE 0.0 END END AS dmp,
    CASE WHEN lag(high, 1) OVER tw IS NOT NULL THEN
      CASE WHEN (lag(low, 1) OVER tw - low) >
                (high - lag(high, 1) OVER tw)
            AND (lag(low, 1) OVER tw - low) > 0.0
        THEN lag(low, 1) OVER tw - low ELSE 0.0 END END AS dmm,
    CASE WHEN lag(close, 1) OVER tw IS NOT NULL THEN
      greatest(high - low, abs(high - lag(close, 1) OVER tw),
        abs(low - lag(close, 1) OVER tw)) END AS tr
  FROM ohlc
  WINDOW tw AS (PARTITION BY ticker ORDER BY window_timestamp)),
b2 AS (
  SELECT ticker, window_timestamp,
    ${chain("dmp")} AS sp,
    ${chain("dmm")} AS sm,
    ${chain("tr")} AS st
  FROM b1
  WINDOW tw2 AS (PARTITION BY ticker ORDER BY window_timestamp)),
b3 AS (
  SELECT ticker, window_timestamp,
    100.0 * sp / (CASE WHEN st <> 0.0 THEN st END) AS pdi,
    100.0 * sm / (CASE WHEN st <> 0.0 THEN st END) AS mdi
  FROM b2),
b4 AS (
  SELECT ticker, window_timestamp, pdi, mdi,
    100.0 * abs(pdi - mdi) /
      (CASE WHEN pdi + mdi <> 0.0 THEN pdi + mdi END) AS dxv
  FROM b3),
b5 AS (
  SELECT ticker, window_timestamp, pdi, mdi, dxv,
    ${chain("dxv")} AS sdx,
    ${cnt("dxv")} AS ndx
  FROM b4
  WINDOW tw2 AS (PARTITION BY ticker ORDER BY window_timestamp))
SELECT ticker, window_timestamp,
  round(pdi, 6) AS plus_di, round(mdi, 6) AS minus_di,
  round(dxv, 6) AS dx,
  CASE WHEN ndx > 0 THEN round(sdx / ndx, 6) END AS adx_14
FROM b5 ORDER BY ticker, window_timestamp"""
    }),
    // Keltner: EMA(20) mid line (generated weighted chain — same
    // Double.toString weights and textual order as the Spark fold) ±
    // 2× the trailing-10 mean true range
    "stock_keltner" -> (Oracles.stockCte + {
      val span = graft.operators.TimeSeries.KeltSpan
      val atrSpan = graft.operators.TimeSeries.KeltAtrSpan
      val alpha = 2.0 / (span + 1)
      val decay = 1.0 - alpha
      val emaTerms = (0 until span).map { i =>
        val wt = math.pow(decay, i).toString
        (s"CASE WHEN lag(close, $i) OVER tw2 IS NOT NULL" +
          s" THEN lag(close, $i) OVER tw2 * $wt ELSE 0.0 END",
          s"CASE WHEN lag(close, $i) OVER tw2 IS NOT NULL" +
            s" THEN CAST($wt AS DOUBLE) ELSE 0.0 END")
      }
      val num = emaTerms.map(_._1).mkString("(", " + ", ")")
      val den = emaTerms.map(_._2).mkString("(", " + ", ")")
      val atrSum = (0 until atrSpan).map(i =>
        s"CASE WHEN lag(tr, $i) OVER tw2 IS NOT NULL" +
          s" THEN lag(tr, $i) OVER tw2 ELSE 0.0 END")
        .mkString(" + ")
      val atrCnt = (0 until atrSpan).map(i =>
        s"CASE WHEN lag(tr, $i) OVER tw2 IS NOT NULL" +
          " THEN 1 ELSE 0 END").mkString(" + ")
      s""",
ohlc AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    max(price) AS high, min(price) AS low, max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2),
b1 AS (
  SELECT ticker, window_timestamp, close,
    CASE WHEN lag(close, 1) OVER tw IS NOT NULL THEN
      greatest(high - low, abs(high - lag(close, 1) OVER tw),
        abs(low - lag(close, 1) OVER tw)) END AS tr
  FROM ohlc
  WINDOW tw AS (PARTITION BY ticker ORDER BY window_timestamp)),
b2 AS (
  SELECT ticker, window_timestamp, close,
    $num / $den AS mid,
    CASE WHEN ($atrCnt) > 0
      THEN ($atrSum) / ($atrCnt) END AS atrc
  FROM b1
  WINDOW tw2 AS (PARTITION BY ticker ORDER BY window_timestamp))
SELECT ticker, window_timestamp, close,
  round(mid, 6) AS kc_mid,
  round(mid + 2.0 * atrc, 6) AS kc_up,
  round(mid - 2.0 * atrc, 6) AS kc_dn
FROM b2 ORDER BY ticker, window_timestamp"""
    }),
    // CCI: two-level chain — trailing mean of typical price, then the
    // mean absolute deviation from that CURRENT mean (Lambert)
    "stock_cci" -> (Oracles.stockCte + {
      val span = graft.operators.TimeSeries.CciSpan
      def sumC(expr: Int => String): String =
        (0 until span).map(expr).mkString(" + ")
      val smaSum = sumC(i =>
        s"CASE WHEN lag(tp, $i) OVER tw IS NOT NULL" +
          s" THEN lag(tp, $i) OVER tw ELSE 0.0 END")
      val smaCnt = sumC(i =>
        s"CASE WHEN lag(tp, $i) OVER tw IS NOT NULL THEN 1 ELSE 0 END")
      val mdSum = sumC(i =>
        s"CASE WHEN lag(tp, $i) OVER tw IS NOT NULL" +
          s" THEN abs(lag(tp, $i) OVER tw - sma) ELSE 0.0 END")
      s""",
ohlc AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    max(price) AS high, min(price) AS low, max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2),
b0 AS (
  SELECT ticker, window_timestamp,
    (high + low + close) / 3.0 AS tp
  FROM ohlc),
b1 AS (
  SELECT ticker, window_timestamp, tp,
    ($smaSum) / ($smaCnt) AS sma
  FROM b0
  WINDOW tw AS (PARTITION BY ticker ORDER BY window_timestamp)),
b2 AS (
  SELECT ticker, window_timestamp, tp, sma,
    ($mdSum) / ($smaCnt) AS md
  FROM b1
  WINDOW tw AS (PARTITION BY ticker ORDER BY window_timestamp))
SELECT ticker, window_timestamp,
  round(tp, 6) AS tp, round(sma, 6) AS tp_sma,
  round(md, 6) AS mean_dev,
  CASE WHEN md <> 0.0
    THEN round((tp - sma) / (0.015 * md), 6) + 0.0 END AS cci_20
FROM b2 ORDER BY ticker, window_timestamp"""
    }),
    // Williams %R: frame max/min (order-insensitive) on the 14-bar span
    "stock_williams_r" -> (Oracles.stockCte + s""",
ohlc AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    max(price) AS high, min(price) AS low, max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2),
k AS (
  SELECT ticker, window_timestamp, close,
    max(high) OVER sw AS hh0, min(low) OVER sw AS ll0
  FROM ohlc
  WINDOW sw AS (PARTITION BY ticker ORDER BY window_timestamp
    ROWS BETWEEN ${graft.operators.TimeSeries.WillSpan - 1} PRECEDING
    AND CURRENT ROW))
SELECT ticker, window_timestamp, close,
  round(hh0, 6) AS hh, round(ll0, 6) AS ll,
  CASE WHEN hh0 <> ll0
    THEN round(-100.0 * (hh0 - close) / (hh0 - ll0), 6) + 0.0
  END AS williams_r
FROM k ORDER BY ticker, window_timestamp"""),
    // Aroon: bar-age of the frame extremes, most-recent tie rule as an
    // ascending-lag CASE chain (same stated rule as the Spark kernel)
    "stock_aroon" -> (Oracles.stockCte + {
      val span = graft.operators.TimeSeries.AroonSpan
      def age(c: String, anchor: String): String =
        (0 until span).map(i =>
          s"WHEN lag($c, $i) OVER tw = $anchor THEN $i")
          .mkString("CASE ", " ", " END")
      s""",
ohlc AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    max(price) AS high, min(price) AS low, max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2),
k AS (
  SELECT ticker, window_timestamp,
    ${age("high", "max(high) OVER sw")} AS age_hh,
    ${age("low", "min(low) OVER sw")} AS age_ll
  FROM ohlc
  WINDOW sw AS (PARTITION BY ticker ORDER BY window_timestamp
    ROWS BETWEEN ${span - 1} PRECEDING AND CURRENT ROW),
  tw AS (PARTITION BY ticker ORDER BY window_timestamp))
SELECT ticker, window_timestamp,
  age_hh AS bars_since_hh, age_ll AS bars_since_ll,
  round(100.0 * (${span - 1}.0 - age_hh) / ${span - 1}.0, 6) AS aroon_up,
  round(100.0 * (${span - 1}.0 - age_ll) / ${span - 1}.0, 6) AS aroon_dn,
  round(100.0 * (${span - 1}.0 - age_hh) / ${span - 1}.0 -
    100.0 * (${span - 1}.0 - age_ll) / ${span - 1}.0, 6) + 0.0 AS aroon_osc
FROM k ORDER BY ticker, window_timestamp"""
    }),
    // Vortex: |H−prevL| / |L−prevH| vs true range over 14-bar chains
    "stock_vortex" -> (Oracles.stockCte + {
      val span = graft.operators.TimeSeries.VortexSpan
      def chain(c: String): String = (0 until span).map(i =>
        s"CASE WHEN lag($c, $i) OVER tw2 IS NOT NULL" +
          s" THEN lag($c, $i) OVER tw2 ELSE 0.0 END")
        .mkString("(", " + ", ")")
      s""",
ohlc AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    max(price) AS high, min(price) AS low, max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2),
b1 AS (
  SELECT ticker, window_timestamp,
    CASE WHEN lag(low, 1) OVER tw IS NOT NULL
      THEN abs(high - lag(low, 1) OVER tw) END AS vmp,
    CASE WHEN lag(high, 1) OVER tw IS NOT NULL
      THEN abs(low - lag(high, 1) OVER tw) END AS vmm,
    CASE WHEN lag(close, 1) OVER tw IS NOT NULL THEN
      greatest(high - low, abs(high - lag(close, 1) OVER tw),
        abs(low - lag(close, 1) OVER tw)) END AS tr
  FROM ohlc
  WINDOW tw AS (PARTITION BY ticker ORDER BY window_timestamp)),
b2 AS (
  SELECT ticker, window_timestamp,
    ${chain("vmp")} AS sp, ${chain("vmm")} AS sm, ${chain("tr")} AS st
  FROM b1
  WINDOW tw2 AS (PARTITION BY ticker ORDER BY window_timestamp))
SELECT ticker, window_timestamp,
  CASE WHEN st <> 0.0 THEN round(sp / st, 6) END AS vi_plus,
  CASE WHEN st <> 0.0 THEN round(sm / st, 6) END AS vi_minus,
  CASE WHEN st <> 0.0 THEN round(sp / st - sm / st, 6) + 0.0 END AS vi_diff
FROM b2 ORDER BY ticker, window_timestamp"""
    }),
    // volume profile: 20 equal price buckets per ticker, VPOC ties to
    // the lowest bucket; the window runs on the bucket grid only
    "stock_volume_profile" -> (Oracles.stockCte + s""",
bounds AS (
  SELECT ticker, min(price) AS p_min, max(price) AS p_max
  FROM stock GROUP BY 1),
binned AS (
  SELECT s.ticker, b.p_min, b.p_max,
    CASE WHEN b.p_max = b.p_min THEN 0
      ELSE least(CAST(floor((s.price - b.p_min) /
        (b.p_max - b.p_min) * ${graft.operators.TimeSeries.VpBuckets})
        AS BIGINT), ${graft.operators.TimeSeries.VpBuckets - 1}) END
      AS bucket,
    s.volume
  FROM stock s JOIN bounds b USING (ticker)),
grid AS (
  SELECT ticker, p_min, p_max, CAST(bucket AS BIGINT) AS bucket,
    CAST(sum(volume) AS BIGINT) AS volume, count(*)::BIGINT AS n_events
  FROM binned GROUP BY 1, 2, 3, 4),
tiered AS (
  SELECT ticker, bucket,
    round(p_min + bucket *
      ((p_max - p_min) / ${graft.operators.TimeSeries.VpBuckets}), 6)
      AS bucket_lo,
    round(p_min + (bucket + 1) *
      ((p_max - p_min) / ${graft.operators.TimeSeries.VpBuckets}), 6)
      AS bucket_hi,
    volume, n_events,
    round(volume / CAST(sum(volume) OVER tw AS DOUBLE), 6) AS share,
    volume = max(volume) OVER tw AS at_max
  FROM grid WINDOW tw AS (PARTITION BY ticker))
SELECT ticker, bucket, bucket_lo, bucket_hi, volume, n_events, share,
  (at_max AND bucket = min(CASE WHEN at_max THEN bucket END)
    OVER (PARTITION BY ticker)) AS is_vpoc
FROM tiered ORDER BY ticker, bucket"""),
    // tick rule: uptick/downtick classification with zero-tick carry
    // (last_value IGNORE NULLS over the (ts, event_id) total order)
    "stock_tick_rule" -> """
WITH stock AS (
  SELECT event_id, event_type AS ticker, ts::TIMESTAMP AS ts,
    value::DOUBLE AS price,
    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS volume
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
    AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL),
tks AS (
  SELECT ticker, ts, volume, event_id,
    CASE WHEN price - lag(price, 1) OVER tw > 0.0 THEN 1
         WHEN price - lag(price, 1) OVER tw < 0.0 THEN -1 END AS tick
  FROM stock
  WINDOW tw AS (PARTITION BY ticker ORDER BY ts, event_id)),
sided AS (
  SELECT ticker, ts, volume,
    last_value(tick IGNORE NULLS) OVER (
      PARTITION BY ticker ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS side
  FROM tks),
bars AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    count(*)::BIGINT AS n_events,
    CAST(sum(CASE WHEN side = 1 THEN volume ELSE 0 END) AS BIGINT)
      AS buy_vol,
    CAST(sum(CASE WHEN side = -1 THEN volume ELSE 0 END) AS BIGINT)
      AS sell_vol,
    CAST(sum(CASE WHEN side IS NULL THEN volume ELSE 0 END) AS BIGINT)
      AS unclassified_vol
  FROM sided GROUP BY 1, 2)
SELECT ticker, window_timestamp, n_events, buy_vol, sell_vol,
  unclassified_vol,
  CASE WHEN buy_vol + sell_vol > 0
    THEN round((buy_vol - sell_vol) / (buy_vol + sell_vol), 6) + 0.0
  END AS ofi
FROM bars ORDER BY ticker, window_timestamp""",
    // MFI: tp·volume classified by tp direction, 14-bar flow chains
    "stock_mfi" -> (Oracles.stockCte + {
      val span = graft.operators.TimeSeries.MfiSpan
      def chain(c: String, zero: String): String = (0 until span).map(i =>
        s"CASE WHEN lag($c, $i) OVER tw2 IS NOT NULL" +
          s" THEN lag($c, $i) OVER tw2 ELSE $zero END")
        .mkString("(", " + ", ")")
      s""",
ohlc AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    max(price) AS high, min(price) AS low, max_by(price, ts) AS close,
    CAST(sum(volume) AS BIGINT) AS volume
  FROM stock GROUP BY 1, 2),
b0 AS (
  SELECT ticker, window_timestamp,
    (high + low + close) / 3.0 AS tp, volume
  FROM ohlc),
b1 AS (
  SELECT ticker, window_timestamp,
    CASE WHEN lag(tp, 1) OVER tw IS NOT NULL
        AND tp > lag(tp, 1) OVER tw
      THEN tp * volume ELSE 0.0 END AS mfp,
    CASE WHEN lag(tp, 1) OVER tw IS NOT NULL
        AND tp < lag(tp, 1) OVER tw
      THEN tp * volume ELSE 0.0 END AS mfm,
    CASE WHEN lag(tp, 1) OVER tw IS NOT NULL
      THEN 1 ELSE 0 END AS scored
  FROM b0
  WINDOW tw AS (PARTITION BY ticker ORDER BY window_timestamp)),
b2 AS (
  SELECT ticker, window_timestamp,
    ${chain("mfp", "0.0")} AS sp, ${chain("mfm", "0.0")} AS sm,
    ${chain("scored", "0")} AS sn
  FROM b1
  WINDOW tw2 AS (PARTITION BY ticker ORDER BY window_timestamp))
SELECT ticker, window_timestamp,
  CAST(sn AS BIGINT) AS n_scored,
  CASE WHEN sp + sm <> 0.0
    THEN round(100.0 * sp / (sp + sm), 6) END AS mfi_14
FROM b2 ORDER BY ticker, window_timestamp"""
    }),
    "stock_atr" -> (Oracles.stockCte + s""",
ohlc AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    max(price) AS high, min(price) AS low, max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2),
trr AS (
  SELECT ticker, window_timestamp,
    CASE WHEN lag(close, 1) OVER tw IS NULL THEN high - low
      ELSE greatest(high - low, abs(high - lag(close, 1) OVER tw),
        abs(low - lag(close, 1) OVER tw)) END AS tr
  FROM ohlc
  WINDOW tw AS (PARTITION BY ticker ORDER BY window_timestamp))
SELECT ticker, window_timestamp, round(tr, 6) AS tr,
  round($atrNum / $atrDen, 6) AS atr_14
FROM trr
WINDOW tw AS (PARTITION BY ticker ORDER BY window_timestamp)
ORDER BY ticker, window_timestamp"""),
    "stock_macd" -> (barsCte + s""",
m AS (
  SELECT ticker, bucket, close,
    (${genEwma("close", graft.operators.TimeSeries.MacdFast)} -
     ${genEwma("close", graft.operators.TimeSeries.MacdSlow)}) AS macd_raw
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket))
SELECT ticker, bucket, close,
  CASE WHEN round(macd_raw, 6) = 0.0 THEN 0.0
    ELSE round(macd_raw, 6) END AS macd,
  CASE WHEN round($macdSignalSql, 6) = 0.0 THEN 0.0
    ELSE round($macdSignalSql, 6) END AS macd_signal,
  CASE WHEN round(macd_raw - $macdSignalSql, 6) = 0.0 THEN 0.0
    ELSE round(macd_raw - $macdSignalSql, 6) END AS macd_hist
FROM m
WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
ORDER BY ticker, bucket"""),
    "stock_stochastic" -> (Oracles.stockCte + s""",
ohlc AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    max(price) AS high, min(price) AS low, max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2),
k AS (
  SELECT ticker, window_timestamp, close,
    CASE WHEN max(high) OVER sw <> min(low) OVER sw
      THEN 100.0 * (close - min(low) OVER sw) /
        (max(high) OVER sw - min(low) OVER sw)
    END AS k_raw
  FROM ohlc
  WINDOW sw AS (PARTITION BY ticker ORDER BY window_timestamp
    ROWS BETWEEN ${graft.operators.TimeSeries.StochSpan - 1} PRECEDING
    AND CURRENT ROW))
SELECT ticker, window_timestamp,
  round(k_raw, 6) AS pct_k,
  CASE WHEN $stochDen > 0 THEN round($stochNum / $stochDen, 6) END AS pct_d
FROM k
WINDOW tw AS (PARTITION BY ticker ORDER BY window_timestamp)
ORDER BY ticker, window_timestamp"""),
    "stock_patterns" -> (Oracles.stockCte + """,
ohlc AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    min_by(price, ts) AS open, max(price) AS high,
    min(price) AS low, max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2)
SELECT ticker, window_timestamp, open, high, low, close,
  CASE WHEN high = low THEN TRUE
    ELSE abs(close - open) <= CAST(0.1 AS DOUBLE) * (high - low)
  END AS is_doji,
  (lag(close) OVER tw IS NOT NULL
   AND lag(close) OVER tw < lag(open) OVER tw
   AND close > open AND open <= lag(close) OVER tw
   AND close >= lag(open) OVER tw) AS is_bullish_engulfing,
  (lag(close) OVER tw IS NOT NULL
   AND lag(close) OVER tw > lag(open) OVER tw
   AND close < open AND open >= lag(close) OVER tw
   AND close <= lag(open) OVER tw) AS is_bearish_engulfing
FROM ohlc
WINDOW tw AS (PARTITION BY ticker ORDER BY window_timestamp)
ORDER BY ticker, window_timestamp"""),
    // VPIN: tick-rule signed trades (zero ticks inherit the last
    // non-zero sign — the full ELO rule) -> equal-volume buckets
    // (integer cumsum + integer div) -> volume-weighted |buy-sell|
    // imbalance; exact integers until the one final division
    "stock_vpin" -> s"""
WITH stock AS (
  SELECT event_type AS ticker, ts::TIMESTAMP AS ts, event_id,
    value::DOUBLE AS price,
    TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS volume
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
    AND TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) IS NOT NULL),
sgn0 AS (
  SELECT ticker, ts, event_id, volume,
    sign(price - lag(price) OVER
      (PARTITION BY ticker ORDER BY ts, event_id)) AS sgn0,
    sum(volume) OVER (PARTITION BY ticker ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - volume
      AS cum_excl
  FROM stock),
sgn AS (
  SELECT ticker, volume, cum_excl,
    last_value(CASE WHEN sgn0 <> 0 THEN sgn0 END IGNORE NULLS) OVER
      (PARTITION BY ticker ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sgn
  FROM sgn0),
tv AS (
  SELECT ticker,
    greatest((CAST(sum(volume) AS BIGINT) + ${graft.operators.TimeSeries.VpinBuckets - 1})
      // ${graft.operators.TimeSeries.VpinBuckets}, 1) AS v_target
  FROM stock GROUP BY 1),
b AS (
  SELECT ticker, v_target, cum_excl // v_target AS bucket,
    CAST(sum(CASE WHEN sgn = 1 THEN volume ELSE 0 END) AS BIGINT)
      AS v_buy,
    CAST(sum(CASE WHEN sgn = -1 THEN volume ELSE 0 END) AS BIGINT)
      AS v_sell,
    CAST(sum(volume) AS BIGINT) AS v_bucket
  FROM sgn JOIN tv USING (ticker)
  GROUP BY 1, 2, 3)
SELECT ticker, count(*)::BIGINT AS n_buckets,
  max(v_target)::BIGINT AS v_target,
  CAST(sum(abs(v_buy - v_sell)) AS BIGINT) AS imbalance,
  CAST(sum(v_buy + v_sell) AS BIGINT) AS v_classified,
  CAST(sum(v_bucket) AS BIGINT) AS v_total,
  CASE WHEN CAST(sum(v_bucket) AS BIGINT) > 0 THEN
    round(CAST(sum(abs(v_buy - v_sell)) AS BIGINT)::DOUBLE /
      CAST(sum(v_bucket) AS BIGINT), 6) END AS vpin
FROM b GROUP BY ticker ORDER BY ticker""",
    "stock_intraday_profile" -> """
WITH stock AS (
  SELECT event_type AS ticker, ts::TIMESTAMP AS ts,
    value::DOUBLE AS price,
    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS volume
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
    AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL)
SELECT ticker, CAST(hour(ts) AS BIGINT) AS hour_utc,
  count(*)::BIGINT AS n_events,
  CAST(sum(volume) AS BIGINT) AS total_volume,
  CASE WHEN CAST(sum(volume) AS BIGINT) > 0 THEN
    round(CAST(CAST(sum(CAST(price * volume AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) /
      CAST(sum(volume) AS BIGINT), 6)
  END AS vwap
FROM stock GROUP BY 1, 2
ORDER BY ticker, hour_utc""",
    "stock_vwap" -> """
WITH stock AS (
  SELECT event_type AS ticker, ts::TIMESTAMP AS ts,
    value::DOUBLE AS price,
    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS volume
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
    AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL)
SELECT ticker,
  make_timestamp((epoch_us(ts::TIMESTAMP) // 300000000) * 300000000)
    AS bucket,
  CAST(sum(volume) AS BIGINT) AS volume,
  CASE WHEN CAST(sum(volume) AS BIGINT) > 0 THEN
    CAST(CAST(CAST(CAST(
      CAST(CAST(sum(CAST(CAST(price * volume AS VARCHAR)
        AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) /
        CAST(sum(volume) AS BIGINT)
      AS VARCHAR) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE)
  END AS vwap
FROM stock GROUP BY 1, 2
ORDER BY ticker, bucket""",
    "stock_obv" -> """
WITH stock AS (
  SELECT event_type AS ticker, ts::TIMESTAMP AS ts,
    value::DOUBLE AS price,
    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS volume
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
    AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL),
vb AS (
  SELECT ticker,
    make_timestamp((epoch_us(ts::TIMESTAMP) // 300000000) * 300000000)
      AS bucket,
    max_by(price, ts) AS close, CAST(sum(volume) AS BIGINT) AS volume
  FROM stock GROUP BY 1, 2),
d AS (
  SELECT ticker, bucket, close, volume,
    close - lag(close, 1) OVER (PARTITION BY ticker ORDER BY bucket)
      AS diff
  FROM vb)
SELECT ticker, bucket, close, volume,
  CAST(sum(CASE WHEN diff > 0 THEN volume
                WHEN diff < 0 THEN -volume ELSE 0 END) OVER (
    PARTITION BY ticker ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
FROM d ORDER BY ticker, bucket""",
    "stock_bollinger" -> (barsCte + s""",
k AS (
  SELECT ticker, bucket, close,
    $bollN AS n, $bollSx AS sx, $bollSxx AS sxx
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket))
SELECT ticker, bucket, close,
  round(sx / n, 6) AS bb_mid,
  CASE WHEN n > 1 THEN round(sx / n +
    2 * sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0)), 6)
  END AS bb_up,
  CASE WHEN n > 1 THEN round(sx / n -
    2 * sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0)), 6)
  END AS bb_dn
FROM k ORDER BY ticker, bucket"""),
    "stock_rsi" -> (barsCte + s""",
d AS (
  SELECT ticker, bucket, close,
    close - lag(close, 1) OVER (PARTITION BY ticker ORDER BY bucket)
      AS diff
  FROM bars)
SELECT ticker, bucket, close, $rsiKernel AS rsi_14
FROM d
WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
ORDER BY ticker, bucket"""),
    "stock_gapfill" -> (barsCte + """,
bounds AS (SELECT ticker, min(bucket) AS lo, max(bucket) AS hi
  FROM bars GROUP BY 1),
spine AS (
  SELECT ticker, unnest(generate_series(lo, hi, INTERVAL 5 MINUTE))
    AS bucket
  FROM bounds)
SELECT s.ticker, s.bucket,
  last_value(b.close IGNORE NULLS) OVER (
    PARTITION BY s.ticker ORDER BY s.bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_close,
  (b.close IS NULL) AS gap_filled
FROM spine s LEFT JOIN bars b USING (ticker, bucket)
ORDER BY ticker, bucket"""),
    "stock_ewma" -> (barsCte + s"""
SELECT ticker, bucket, close, $ewmaKernel AS ewma_12
FROM bars
WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
ORDER BY ticker, bucket"""),
    "stock_rolling_corr" -> (barsCte + s""",
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS ret
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY ret IS NOT NULL),
j AS (
  SELECT a.ticker AS ticker_a, b.ticker AS ticker_b, a.bucket,
    a.ret AS ret_a, b.ret AS ret_b
  FROM rets a JOIN rets b ON a.bucket = b.bucket AND a.ticker < b.ticker),
k AS (
  SELECT ticker_a, ticker_b, bucket,
    CAST($rcN AS DOUBLE) AS n, $rcSx AS sx, $rcSy AS sy,
    $rcSxy AS sxy, $rcSxx AS sxx, $rcSyy AS syy
  FROM j
  WINDOW tw AS (PARTITION BY ticker_a, ticker_b ORDER BY bucket))
SELECT ticker_a, ticker_b, bucket, CAST(n AS BIGINT) AS n_obs,
  CASE WHEN n > 1 AND n * sxx - sx * sx > 0.0 AND n * syy - sy * sy > 0.0
    THEN round((n * sxy - sx * sy) /
      sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0
  END AS roll_corr
FROM k ORDER BY ticker_a, ticker_b, bucket"""),
    "stock_streaks" -> (barsCte + """,
sg AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw IS NULL THEN 0
      WHEN close > lag(close, 1) OVER tw THEN 1
      WHEN close < lag(close, 1) OVER tw THEN -1 ELSE 0 END AS sgn
  FROM bars WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)),
rr AS (
  SELECT ticker, sgn,
    row_number() OVER (PARTITION BY ticker ORDER BY bucket) -
    row_number() OVER (PARTITION BY ticker, sgn ORDER BY bucket) AS grp
  FROM sg),
runs AS (
  SELECT ticker, sgn, grp, count(*) AS len
  FROM rr WHERE sgn <> 0 GROUP BY 1, 2, 3)
SELECT ticker,
  CAST(max(CASE WHEN sgn = 1 THEN len END) AS BIGINT) AS max_up_streak,
  CAST(max(CASE WHEN sgn = -1 THEN len END) AS BIGINT)
    AS max_down_streak,
  CAST(sum(CASE WHEN sgn = 1 THEN len ELSE 0 END) AS BIGINT)
    AS n_up_moves,
  CAST(sum(CASE WHEN sgn = -1 THEN len ELSE 0 END) AS BIGINT)
    AS n_down_moves
FROM runs GROUP BY ticker ORDER BY ticker"""),
    "stock_sharpe" -> (barsCte + s""",
rets AS (
  SELECT ticker,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
m AS (
  SELECT ticker, count(*) AS n_rets,
    CAST(CAST(sum(CAST(r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS s1,
    CAST(CAST(sum(CAST(r * r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS s2,
    CAST(CAST(sum(CAST(CASE WHEN r < 0.0 THEN r * r ELSE 0.0 END
      AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS s2d
  FROM rets GROUP BY ticker),
d AS (
  SELECT ticker, n_rets, CAST(n_rets AS DOUBLE) AS nd,
    s1 / CAST(n_rets AS DOUBLE) AS mean,
    sqrt(greatest(s2 / CAST(n_rets AS DOUBLE) -
      s1 / CAST(n_rets AS DOUBLE) * (s1 / CAST(n_rets AS DOUBLE)),
      0.0)) AS sd,
    sqrt(s2d / CAST(n_rets AS DOUBLE)) AS dd
  FROM m)
SELECT ticker, n_rets, round(mean, 6) AS mean_ret,
  CASE WHEN n_rets >= ${graft.operators.TimeSeries.VarMinObs}
    AND sd > 0.0 THEN round(mean / sd, 6) END AS sharpe,
  CASE WHEN n_rets >= ${graft.operators.TimeSeries.VarMinObs}
    AND dd > 0.0 THEN round(mean / dd, 6) END AS sortino
FROM d ORDER BY ticker"""),
    "stock_beta" -> (barsCte + s""",
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
mkt AS (
  SELECT bucket,
    CAST(CAST(sum(CAST(r AS DECIMAL(28,14))) AS VARCHAR) AS DOUBLE) / count(*) AS m
  FROM rets GROUP BY bucket),
mo AS (
  SELECT ticker, count(*) AS n_obs,
    CAST(CAST(sum(CAST(r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sr,
    CAST(CAST(sum(CAST(m AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sm,
    CAST(CAST(sum(CAST(r * m AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS srm,
    CAST(CAST(sum(CAST(m * m AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS smm
  FROM rets JOIN mkt USING (bucket) GROUP BY ticker)
SELECT ticker, n_obs,
  CASE WHEN n_obs >= ${graft.operators.TimeSeries.VarMinObs}
      AND CAST(n_obs AS DOUBLE) * smm - sm * sm <> 0.0 THEN
    round((CAST(n_obs AS DOUBLE) * srm - sr * sm) /
      (CAST(n_obs AS DOUBLE) * smm - sm * sm), 6) END AS beta,
  CASE WHEN n_obs >= ${graft.operators.TimeSeries.VarMinObs}
      AND CAST(n_obs AS DOUBLE) * smm - sm * sm <> 0.0 THEN
    round((sr - (CAST(n_obs AS DOUBLE) * srm - sr * sm) /
        (CAST(n_obs AS DOUBLE) * smm - sm * sm) * sm) /
      CAST(n_obs AS DOUBLE), 6) END AS alpha
FROM mo ORDER BY ticker"""),
    "stock_var_es" -> (barsCte + s""",
rets AS (
  SELECT ticker,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS v
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY v IS NOT NULL),
q AS (
  SELECT ticker,
    round(quantile_cont(v, ${graft.operators.TimeSeries.VarLevel})::DOUBLE,
      6) AS var_5
  FROM rets GROUP BY ticker),
a AS (
  SELECT r.ticker, count(*) AS n_rets, max(q.var_5) AS v5,
    count(*) FILTER (r.v <= q.var_5) AS n_tail,
    CAST(sum(CAST(r.v AS DECIMAL(38,18)))
        FILTER (r.v <= q.var_5) AS DOUBLE) /
      count(*) FILTER (r.v <= q.var_5) AS es_raw
  FROM rets r JOIN q ON r.ticker = q.ticker GROUP BY r.ticker)
SELECT ticker, n_rets,
  CASE WHEN n_rets >= ${graft.operators.TimeSeries.VarMinObs}
    THEN v5 END AS var_5,
  CASE WHEN n_rets >= ${graft.operators.TimeSeries.VarMinObs}
    THEN CAST(n_tail AS BIGINT) END AS n_tail,
  CASE WHEN n_rets >= ${graft.operators.TimeSeries.VarMinObs}
    THEN round(es_raw, 6) END AS es_5
FROM a ORDER BY ticker"""),
    "stock_moments" -> (barsCte + """,
rets AS (
  SELECT ticker,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
m AS (
  SELECT ticker, count(*) AS n_rets,
    CAST(CAST(sum(CAST(r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS s1,
    CAST(CAST(sum(CAST(r * r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS s2,
    CAST(CAST(sum(CAST(r * r * r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS s3,
    CAST(CAST(sum(CAST(r * r * r * r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS s4
  FROM rets GROUP BY ticker),
d AS (
  SELECT ticker, n_rets, s1, s2, s3, s4,
    CAST(n_rets AS DOUBLE) AS nd, s1 / CAST(n_rets AS DOUBLE) AS mean,
    s2 / CAST(n_rets AS DOUBLE) -
      s1 / CAST(n_rets AS DOUBLE) * (s1 / CAST(n_rets AS DOUBLE)) AS v
  FROM m)
SELECT ticker, n_rets,
  round(mean, 6) AS mean_ret,
  CASE WHEN n_rets > 1 AND v > 0.0 THEN round(v, 6) END AS var_ret,
  CASE WHEN n_rets > 1 AND v > 0.0 THEN
    round((s3 / nd - 3.0 * mean * v - mean * mean * mean) /
      sqrt(v * v * v), 6) END AS skew_ret,
  CASE WHEN n_rets > 1 AND v > 0.0 THEN
    round((s4 / nd - 4.0 * mean * (s3 / nd) +
      6.0 * mean * mean * (s2 / nd) -
      3.0 * mean * mean * mean * mean) / (v * v) - 3.0, 6)
  END AS kurt_excess
FROM d ORDER BY ticker"""),
    // Roll effective spread: lagged close-change pairs, decimal moment
    // sums, pinned-order autocovariance and 2*sqrt(-cov)
    "stock_roll_spread" -> (barsCte + """,
dd AS (
  SELECT ticker, bucket, close - lag(close, 1) OVER tw AS dx
  FROM bars WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)),
pp AS (
  SELECT ticker, dx, lag(dx, 1) OVER tw2 AS dy
  FROM dd WINDOW tw2 AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY dx IS NOT NULL AND dy IS NOT NULL),
m AS (
  SELECT ticker, count(*)::BIGINT AS n_pairs,
    CAST(CAST(sum(CAST(dx AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(sum(CAST(dy AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(sum(CAST(dx * dy AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sxy
  FROM pp GROUP BY 1),
dcv AS (
  SELECT ticker, n_pairs,
    sxy / CAST(n_pairs AS DOUBLE) -
      sx / CAST(n_pairs AS DOUBLE) * (sy / CAST(n_pairs AS DOUBLE))
      AS cov
  FROM m)
SELECT ticker, n_pairs, round(cov, 6) AS dcov,
  CASE WHEN n_pairs > 1 AND cov < 0.0 THEN
    round(2.0 * sqrt(-cov), 6) END AS roll_spread
FROM dcv ORDER BY ticker"""),
    // Garman-Klass / Parkinson range volatility: OHLC bars re-derived
    // on the identical 5-minute partition, per-bar terms on the 1e-12
    // grid, interpolated IEEE constants
    "stock_garman_klass" -> {
      val k = 2 * math.log(2) - 1
      val p4 = 4 * math.log(2)
      graft.Oracles.stockCte + s""",
ob AS (
  SELECT ticker, (epoch_us(ts::TIMESTAMP) // 300000000) AS b,
    min_by(price, ts) AS open, max(price) AS high,
    min(price) AS low, max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2),
t AS (
  SELECT ticker,
    CAST(round(0.5 * ln(high / low) * ln(high / low) -
      $k * ln(close / open) * ln(close / open), 12)
      AS DECIMAL(18,12)) AS gk,
    CAST(round(ln(high / low) * ln(high / low) / $p4, 12)
      AS DECIMAL(18,12)) AS pk
  FROM ob WHERE low > 0 AND open > 0)
SELECT ticker, count(*)::BIGINT AS n_bars,
  round(CAST(sum(gk) AS DOUBLE) / count(*), 6) AS gk_var,
  round(CAST(sum(pk) AS DOUBLE) / count(*), 6) AS parkinson_var
FROM t GROUP BY 1 ORDER BY ticker"""
    },
    // realized-vol signature: per-frequency re-bucketed bars, decimal
    // squared-return sums
    "stock_rv_signature" -> {
      val stockCte = """
WITH stock AS (
  SELECT event_type AS ticker, ts::TIMESTAMP AS ts,
    value::DOUBLE AS price
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
    AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL)"""
      val blocks = graft.operators.TimeSeries.RvFreqs.map { sec =>
        val us = sec.toLong * 1000000L
        s"""
SELECT ticker, ${sec / 60}::BIGINT AS freq_minutes,
  count(*)::BIGINT AS n_rets,
  -- VARCHAR crossings + VARCHAR-mediated 6dp round: rv reaches ~2e9
  -- at sf1 where the engines' double->decimal casts diverge sub-ulp
  -- and DuckDB's float-scaled round(x, 6) is lossy (round-10 sweep)
  CAST(CAST(CAST(CAST(
    CAST(CAST(sum(CAST(CAST(r * r AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE)
    AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)
    AS realized_var
FROM (
  SELECT ticker,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM (
    SELECT ticker,
      make_timestamp((epoch_us(ts::TIMESTAMP) // $us) * $us) AS bucket,
      max_by(price, ts) AS close
    FROM stock GROUP BY 1, 2)
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL)
GROUP BY ticker"""
      }.mkString("\nUNION ALL")
      s"$stockCte$blocks\nORDER BY ticker, freq_minutes"
    },
    // Amihud illiquidity: decimal-grid dollar-volume and ratio sums,
    // pinned-order mean × 1e6
    "stock_amihud" -> """
WITH stock AS (
  SELECT event_type AS ticker, ts::TIMESTAMP AS ts,
    value::DOUBLE AS price,
    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS volume
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
    AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL),
bars AS (
  SELECT ticker,
    make_timestamp((epoch_us(ts::TIMESTAMP) // 300000000) * 300000000)
      AS bucket,
    max_by(price, ts) AS close,
    CAST(CAST(sum(CAST(price * volume AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS dv
  FROM stock GROUP BY 1, 2),
rets AS (
  SELECT ticker,
    CASE WHEN lag(close, 1) OVER tw <> 0 AND dv > 0
      THEN abs(close / lag(close, 1) OVER tw - 1) / dv END AS x
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)),
m AS (
  SELECT ticker, count(x)::BIGINT AS n_bars,
    CAST(CAST(sum(CAST(x AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sx
  FROM rets GROUP BY 1)
SELECT ticker, n_bars,
  CASE WHEN n_bars > 0 THEN round(sx / n_bars * 1000000.0, 6) END
    AS amihud_x1m
FROM m ORDER BY ticker""",
    // variance ratio: identical lag-window log returns on both
    // horizons, DECIMAL(38,18) moment sums, pinned-order final ratio
    "stock_variance_ratio" -> (barsCte + {
      val q = graft.operators.TimeSeries.VrQ
      s""",
rets AS (
  SELECT ticker,
    CASE WHEN lag(close, 1) OVER tw > 0 AND close > 0
      THEN ln(close / lag(close, 1) OVER tw) END AS r1,
    CASE WHEN lag(close, $q) OVER tw > 0 AND close > 0
      THEN ln(close / lag(close, $q) OVER tw) END AS rq
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)),
m AS (
  SELECT ticker,
    count(r1)::BIGINT AS n1,
    CAST(CAST(sum(CAST(r1 AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS a1,
    CAST(CAST(sum(CAST(r1 * r1 AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS b1,
    count(rq)::BIGINT AS nq,
    CAST(CAST(sum(CAST(rq AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS aq,
    CAST(CAST(sum(CAST(rq * rq AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS bq
  FROM rets GROUP BY 1),
d AS (
  SELECT ticker, n1, nq,
    b1 / CAST(n1 AS DOUBLE) -
      a1 / CAST(n1 AS DOUBLE) * (a1 / CAST(n1 AS DOUBLE)) AS v1,
    bq / CAST(nq AS DOUBLE) -
      aq / CAST(nq AS DOUBLE) * (aq / CAST(nq AS DOUBLE)) AS vq
  FROM m)
SELECT ticker, n1, nq,
  CASE WHEN n1 > 1 AND nq > 1 AND v1 > 0.0 THEN
    round(vq / (${q.toDouble} * v1), 6) END AS variance_ratio
FROM d ORDER BY ticker"""
    }),
    // bipower-variation jump detection: lag-pair absolute products on
    // the decimal grid, interpolated pi/2, pinned-order jump share
    "stock_jump_detection" -> (barsCte + {
      val halfPi = math.Pi / 2
      s""",
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
wl AS (
  SELECT ticker, r, lag(r, 1) OVER tw2 AS rl
  FROM rets WINDOW tw2 AS (PARTITION BY ticker ORDER BY bucket)),
m AS (
  -- VARCHAR crossings on BOTH decimal casts (cross-engine sub-ulp at
  -- the ~1e8 magnitudes MakeScale's sf1 returns reach: Spark casts
  -- double->decimal via shortest repr, DuckDB via the exact binary
  -- expansion - found as a 1-ulp realized_var edge in the round-10
  -- sf1 sweep), and the 6dp rounds stated as VARCHAR-mediated decimal
  -- rounds (DuckDB's float-scaled round(x, 6) is lossy at x*1e6 >
  -- ~1e14; the VARCHAR round is Spark's BigDecimal HALF_UP exactly)
  SELECT ticker, count(r)::BIGINT AS n_rets,
    CAST(CAST(sum(CAST(CAST(r * r AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS rv,
    CAST(CAST(sum(CAST(CAST(CASE WHEN rl IS NOT NULL
      THEN abs(r) * abs(rl) END AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS bvs
  FROM wl GROUP BY 1)
SELECT ticker, n_rets,
  CAST(CAST(CAST(CAST(rv AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR)
    AS DOUBLE) AS realized_var,
  CAST(CAST(CAST(CAST($halfPi * coalesce(bvs, 0.0) AS VARCHAR)
    AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS bipower_var,
  CASE WHEN rv > 0.0 THEN
    round(greatest(0.0,
      1.0 - $halfPi * coalesce(bvs, 0.0) / rv), 6) END AS jump_share
FROM m ORDER BY ticker"""
    }),
    // return ACF at lags 1-5: per-lag window pairs, DuckDB corr (NULL
    // on degenerate) vs Spark nanToNull(corr) — round-6 parity proven
    // by stock_corr_pairs
    // Bartlett realized kernel: per-lag cross products on the 1e-12
    // grid + decimal sums, 2·w_h literals interpolated from the SAME
    // Scala constants the engine uses, coalesce-0 short series
    "stock_realized_kernel" -> (barsCte + {
      val lags = 1 to graft.operators.TimeSeries.RkLags
      val lagCols = lags.map(h =>
        s"    lag(r, $h) OVER tw2 AS rl$h").mkString(",\n")
      val gCols = lags.map(h =>
        s"""    CAST(CAST(sum(CAST(CAST(r * rl$h AS VARCHAR)
      AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS g$h""").mkString(",\n")
      val rkExpr = "g0" + lags.map(h =>
        s" + ${graft.operators.TimeSeries.rkWeight2(h)} * coalesce(g$h, 0.0)")
        .mkString
      s""",
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
lagd AS (
  SELECT ticker, r,
$lagCols
  FROM rets WINDOW tw2 AS (PARTITION BY ticker ORDER BY bucket)),
m AS (
  SELECT ticker, count(*)::BIGINT AS n_rets,
    CAST(CAST(sum(CAST(CAST(r * r AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS g0,
$gCols
  FROM lagd GROUP BY ticker)
SELECT ticker, n_rets,
  CAST(CAST(CAST(CAST(g0 AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR)
    AS DOUBLE) AS rv,
  CAST(CAST(CAST(CAST($rkExpr AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR)
    AS DOUBLE) AS rk,
  round(($rkExpr) / (CASE WHEN g0 > 0.0 THEN g0 END), 6)
    AS kernel_ratio
FROM m ORDER BY ticker"""
    }),
    "stock_acf" -> (barsCte + {
      val blocks = graft.operators.TimeSeries.AcfLags.map { k =>
        s"""
SELECT ticker, $k::BIGINT AS lag, count(*)::BIGINT AS n_pairs,
  round(corr(r, rl), 6) AS acf
FROM (
  SELECT ticker, r, lag(r, $k) OVER tw2 AS rl
  FROM rets WINDOW tw2 AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY rl IS NOT NULL)
GROUP BY ticker"""
      }.mkString("\nUNION ALL")
      s""",
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL)$blocks
ORDER BY ticker, lag"""
    }),
    // Ljung-Box portmanteau Q over ACF lags 1-5: textbook full-sample-
    // mean ACF estimator from DECIMAL(38,18) moment sums (one window
    // pass), pinned named-column double algebra, NULL-guarded variance
    "stock_ljung_box" -> (barsCte + {
      val ks = graft.operators.TimeSeries.AcfLags
      val lagCols = ks.map(k => s"    lag(r, $k) OVER tw2 AS rl$k")
        .mkString(",\n")
      val sumCols = ks.map { k =>
        s"""    count(rl$k)::BIGINT AS np$k,
    CAST(CAST(sum(CAST(CASE WHEN rl$k IS NOT NULL THEN r * rl$k END
      AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sxy$k,
    CAST(CAST(sum(CAST(CASE WHEN rl$k IS NOT NULL THEN r END
      AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sx$k,
    CAST(CAST(sum(CAST(rl$k AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sl$k"""
      }.mkString(",\n")
      val passthrough = ks.map(k => s"np$k, sxy$k, sx$k, sl$k")
        .mkString(", ")
      val rhoCols = ks.map { k =>
        s"""    (sxy$k - rbar * (sx$k + sl$k) +
      CAST(np$k AS DOUBLE) * (rbar * rbar)) /
      (CASE WHEN denom <> 0.0 THEN denom END) AS rho$k"""
      }.mkString(",\n")
      val npPass = ks.map(k => s"np$k").mkString(", ")
      val terms = ks.map { k =>
        s"""(CASE WHEN np$k > 0
      THEN rho$k * rho$k / CAST(np$k AS DOUBLE) ELSE 0.0 END)"""
      }.mkString(" +\n    ")
      val rhoOut = ks.map(k => s"  round(rho$k, 6) AS rho_$k")
        .mkString(",\n")
      s""",
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
lagged AS (
  SELECT ticker, r,
$lagCols
  FROM rets WINDOW tw2 AS (PARTITION BY ticker ORDER BY bucket)),
sums AS (
  SELECT ticker, count(*)::BIGINT AS n,
    CAST(CAST(sum(CAST(r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sr,
    CAST(CAST(sum(CAST(r * r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS srr,
$sumCols
  FROM lagged GROUP BY 1),
named AS (
  SELECT ticker, n, sr / CAST(n AS DOUBLE) AS rbar,
    srr - sr * sr / CAST(n AS DOUBLE) AS denom,
    $passthrough
  FROM sums),
rhos AS (
  SELECT ticker, n, $npPass,
$rhoCols
  FROM named)
SELECT ticker, n AS n_obs,
$rhoOut,
  round(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) *
    ($terms), 6) AS q_lb
FROM rhos ORDER BY ticker"""
    }),
    // Engle-Granger cointegration: price-level OLS + no-constant DF
    // step on the residual; all moment sums VARCHAR-mediated (price
    // sums sit in the 1e5+ magnitude band), closed forms pinned
    "stock_cointegration" -> (barsCte + s""",
j AS (
  SELECT a.ticker AS ticker_a, b.ticker AS ticker_b, a.bucket,
    a.close AS x, b.close AS y
  FROM bars a JOIN bars b
    ON a.bucket = b.bucket AND a.ticker < b.ticker),
m1 AS (
  SELECT ticker_a, ticker_b, count(*)::BIGINT AS n_bars,
    ${vsum18("x")} AS sx, ${vsum18("y")} AS sy,
    ${vsum18("x * x")} AS sxx, ${vsum18("x * y")} AS sxy
  FROM j GROUP BY 1, 2),
fit AS (
  SELECT ticker_a, ticker_b, n_bars, sx, sy,
    (sxy - sx * sy / CAST(n_bars AS DOUBLE)) /
      (CASE WHEN sxx - sx * sx / CAST(n_bars AS DOUBLE) <> 0.0
        THEN sxx - sx * sx / CAST(n_bars AS DOUBLE) END) AS beta
  FROM m1),
fit2 AS (
  SELECT ticker_a, ticker_b, n_bars, beta,
    (sy - beta * sx) / CAST(n_bars AS DOUBLE) AS alpha
  FROM fit),
resid AS (
  SELECT j.ticker_a, j.ticker_b, j.bucket, f.n_bars, f.beta, f.alpha,
    j.y - (f.alpha + f.beta * j.x) AS e
  FROM j JOIN fit2 f USING (ticker_a, ticker_b)),
steps AS (
  SELECT ticker_a, ticker_b, n_bars, beta, alpha, el, e - el AS de
  FROM (
    SELECT *, lag(e, 1) OVER pw AS el FROM resid
    WINDOW pw AS (PARTITION BY ticker_a, ticker_b ORDER BY bucket))
  WHERE el IS NOT NULL),
m2 AS (
  SELECT ticker_a, ticker_b, max(n_bars) AS n_bars,
    max(beta) AS beta, max(alpha) AS alpha,
    count(*)::BIGINT AS n_steps,
    ${vsum18("el * el")} AS see, ${vsum18("el * de")} AS sed,
    ${vsum18("de * de")} AS sdd
  FROM steps GROUP BY 1, 2)
SELECT ticker_a, ticker_b, n_bars, round(beta, 6) AS beta,
  round(alpha, 6) AS alpha,
  round(sed / (CASE WHEN see <> 0.0 THEN see END), 6) AS gamma,
  round((sed / (CASE WHEN see <> 0.0 THEN see END)) /
    (CASE WHEN ((sdd - (sed / (CASE WHEN see <> 0.0 THEN see END))
        * sed) / CAST(n_steps - 1 AS DOUBLE)) / see > 0.0
      THEN sqrt(((sdd - (sed / (CASE WHEN see <> 0.0 THEN see END))
        * sed) / CAST(n_steps - 1 AS DOUBLE)) / see) END), 6) AS df_t
FROM m2 ORDER BY ticker_a, ticker_b"""),
    // Bandt-Pompe order-3 permutation entropy: the SHARED pattern
    // CASE (tie handling pinned), round-12 decimal -p ln p terms
    "stock_permutation_entropy" -> (barsCte + s""",
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
trip AS (
  SELECT ticker, c, b, a FROM (
    SELECT ticker, r AS c,
      lag(r, 1) OVER tw2 AS b, lag(r, 2) OVER tw2 AS a
    FROM rets
    WINDOW tw2 AS (PARTITION BY ticker ORDER BY bucket))
  WHERE a IS NOT NULL),
counts AS (
  SELECT ticker, pattern, count(*)::BIGINT AS cnt FROM (
    SELECT ticker, ${graft.operators.TimeSeries.pePattern} AS pattern
    FROM trip)
  GROUP BY 1, 2),
totals AS (
  SELECT ticker, CAST(sum(cnt) AS BIGINT) AS n_triples
  FROM counts GROUP BY 1),
terms AS (
  SELECT c.ticker, t.n_triples,
    CAST(round(-(CAST(cnt AS DOUBLE) / CAST(n_triples AS DOUBLE) *
      ln(CAST(cnt AS DOUBLE) / CAST(n_triples AS DOUBLE))), 12)
      AS DECIMAL(28,12)) AS term
  FROM counts c JOIN totals t ON c.ticker = t.ticker),
m AS (
  SELECT ticker, max(n_triples) AS n_triples,
    count(*)::BIGINT AS n_patterns,
    CAST(sum(term) AS DOUBLE) AS h
  FROM terms GROUP BY 1)
SELECT ticker, n_triples, n_patterns,
  round(h, 6) AS perm_entropy,
  round(h / ${graft.operators.TimeSeries.peLn6}, 6) AS pe_norm
FROM m ORDER BY ticker"""),
    // Sortino/Omega: pinned per-row gain/loss splits, decimal sums,
    // guarded divisors
    "stock_sortino" -> (barsCte + """,
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
m AS (
  SELECT ticker, count(*)::BIGINT AS n_rets,
    CAST(CAST(sum(CAST(r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sr,
    CAST(CAST(sum(CAST(least(r, 0.0) * least(r, 0.0) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sdd,
    CAST(CAST(sum(CAST(greatest(r, 0.0) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
      AS sgain,
    CAST(CAST(sum(CAST(-least(r, 0.0) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
      AS sloss
  FROM rets GROUP BY 1)
SELECT ticker, n_rets,
  round(sr / CAST(n_rets AS DOUBLE), 6) AS mean_ret,
  round(sqrt(sdd / CAST(n_rets AS DOUBLE)), 6) AS downside_dev,
  round((sr / CAST(n_rets AS DOUBLE)) /
    (CASE WHEN sqrt(sdd / CAST(n_rets AS DOUBLE)) <> 0.0
      THEN sqrt(sdd / CAST(n_rets AS DOUBLE)) END), 6) AS sortino,
  round(sgain / (CASE WHEN sloss <> 0.0 THEN sloss END), 6) AS omega
FROM m ORDER BY ticker"""),
    // fractional differencing: generated binomial-weight lag chain
    // (shared shortest-repr literals), NULL outside the full window
    "stock_fracdiff" -> (barsCte + {
      val n = graft.operators.TimeSeries.FracWindow
      val ws = graft.operators.TimeSeries.fracWeights
      val lags = (1 until n)
        .map(k => s"lag(close, $k) OVER tw AS lg$k").mkString(",\n    ")
      val terms = ws.zipWithIndex.map { case (wk, k) =>
        val c = if (k == 0) "close" else s"lg$k"
        s"$c * $wk"
      }.mkString(" + ")
      s""",
wl AS (
  SELECT ticker, bucket, close,
    $lags
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket))
SELECT ticker, bucket,
  CASE WHEN lg${n - 1} IS NOT NULL
    THEN round($terms, 6) END AS fracdiff
FROM wl ORDER BY ticker, bucket"""
    }),
    // Kupiec POF + Christoffersen independence VaR backtest: shared
    // ln-p literals, round-12 data logs (args NULL-guarded — DuckDB
    // raises on ln(0)), 0*ln0=0 transition convention
    "stock_var_backtest" -> (barsCte + {
      val lv = graft.operators.TimeSeries.VarLevel
      val l1 = graft.operators.TimeSeries.lnVar1P
      val lp = graft.operators.TimeSeries.lnVarP
      def t0(c: String, p: String): String =
        s"CASE WHEN $c > 0 THEN CAST($c AS DOUBLE) * " +
          s"round(ln(CASE WHEN $p > 0.0 THEN $p END), 12) ELSE 0.0 END"
      val pi01 = "CAST(n01 AS DOUBLE) / (CASE WHEN n00 + n01 > 0" +
        " THEN CAST(n00 + n01 AS DOUBLE) END)"
      val pi11 = "CAST(n11 AS DOUBLE) / (CASE WHEN n10 + n11 > 0" +
        " THEN CAST(n10 + n11 AS DOUBLE) END)"
      val pi = "CAST(n01 + n11 AS DOUBLE) / " +
        "CAST(n00 + n01 + n10 + n11 AS DOUBLE)"
      val ll0 = s"${t0("n00 + n10", s"1.0 - $pi")} + " +
        s"${t0("n01 + n11", pi)}"
      val llA = s"${t0("n00", s"1.0 - $pi01")} + ${t0("n01", pi01)}" +
        s" + ${t0("n10", s"1.0 - $pi11")} + ${t0("n11", pi11)}"
      val xr = "CAST(x AS DOUBLE) / CAST(n_rets AS DOUBLE)"
      val lrPof = s"-2.0 * ((CAST(n_rets AS DOUBLE) - CAST(x AS " +
        s"DOUBLE)) * $l1 + CAST(x AS DOUBLE) * $lp - " +
        s"(CAST(n_rets AS DOUBLE) - CAST(x AS DOUBLE)) * " +
        s"round(ln(CASE WHEN 1.0 - $xr > 0.0 THEN 1.0 - $xr END), 12)" +
        s" - CAST(x AS DOUBLE) * " +
        s"round(ln(CASE WHEN $xr > 0.0 THEN $xr END), 12))"
      val lrInd = s"-2.0 * (($ll0) - ($llA))"
      s""",
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS v
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY v IS NOT NULL),
q AS (
  SELECT ticker, round(quantile_cont(v, $lv)::DOUBLE, 6) AS var_5
  FROM rets GROUP BY ticker),
hits AS (
  SELECT r.ticker, r.bucket,
    CASE WHEN r.v <= q.var_5 THEN 1 ELSE 0 END AS hit
  FROM rets r JOIN q ON r.ticker = q.ticker),
tot AS (
  SELECT ticker, count(*)::BIGINT AS n_rets,
    CAST(sum(hit) AS BIGINT) AS x
  FROM hits GROUP BY 1),
trans AS (
  SELECT ticker,
    CAST(sum(CASE WHEN ph = 0 AND hit = 0 THEN 1 ELSE 0 END)
      AS BIGINT) AS n00,
    CAST(sum(CASE WHEN ph = 0 AND hit = 1 THEN 1 ELSE 0 END)
      AS BIGINT) AS n01,
    CAST(sum(CASE WHEN ph = 1 AND hit = 0 THEN 1 ELSE 0 END)
      AS BIGINT) AS n10,
    CAST(sum(CASE WHEN ph = 1 AND hit = 1 THEN 1 ELSE 0 END)
      AS BIGINT) AS n11
  FROM (SELECT ticker, hit, lag(hit, 1) OVER hw AS ph FROM hits
    WINDOW hw AS (PARTITION BY ticker ORDER BY bucket))
  WHERE ph IS NOT NULL GROUP BY ticker)
SELECT t.ticker, t.n_rets, t.x AS n_viol, tr.n01, tr.n11,
  CASE WHEN t.x > 0 AND t.x < t.n_rets
    THEN round($lrPof, 6) END AS lr_pof,
  round($lrInd, 6) AS lr_ind,
  CASE WHEN t.x > 0 AND t.x < t.n_rets
    THEN round(($lrPof) + ($lrInd), 6) END AS lr_cc
FROM tot t JOIN trans tr ON t.ticker = tr.ticker
ORDER BY t.ticker"""
    }),
    // Ichimoku cloud: rolling (max+min)/2 midlines, spans shifted by
    // the kijun period, partial warm-up windows stated identically
    "stock_ichimoku" -> (barsCte + {
      val (t, k, sb) = (graft.operators.TimeSeries.IchiTenkan,
        graft.operators.TimeSeries.IchiKijun,
        graft.operators.TimeSeries.IchiSenkouB)
      s""",
mids AS (
  SELECT ticker, bucket, close,
    (max(close) OVER ft + min(close) OVER ft) / 2.0 AS tenkan0,
    (max(close) OVER fk + min(close) OVER fk) / 2.0 AS kijun0,
    (max(close) OVER fb + min(close) OVER fb) / 2.0 AS senkou_b0
  FROM bars
  WINDOW
    ft AS (PARTITION BY ticker ORDER BY bucket
      ROWS BETWEEN ${t - 1} PRECEDING AND CURRENT ROW),
    fk AS (PARTITION BY ticker ORDER BY bucket
      ROWS BETWEEN ${k - 1} PRECEDING AND CURRENT ROW),
    fb AS (PARTITION BY ticker ORDER BY bucket
      ROWS BETWEEN ${sb - 1} PRECEDING AND CURRENT ROW))
SELECT ticker, bucket, round(tenkan0, 6) AS tenkan,
  round(kijun0, 6) AS kijun,
  round(lag((tenkan0 + kijun0) / 2.0, $k) OVER tw, 6) AS senkou_a,
  round(lag(senkou_b0, $k) OVER tw, 6) AS senkou_b,
  lead(close, $k) OVER tw AS chikou
FROM mids
WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
ORDER BY ticker, bucket"""
    }),
    // min-variance pair weights: aligned-return decimal moments,
    // pinned closed-form w and portfolio variance, guarded divisors
    "stock_minvar_pairs" -> (barsCte + """,
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
m AS (
  SELECT a.ticker AS ticker_a, b.ticker AS ticker_b,
    count(*)::BIGINT AS n_steps,
    CAST(CAST(sum(CAST(a.r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(sum(CAST(b.r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(sum(CAST(a.r * a.r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sxx,
    CAST(CAST(sum(CAST(b.r * b.r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS syy,
    CAST(CAST(sum(CAST(a.r * b.r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sxy
  FROM rets a JOIN rets b
    ON a.bucket = b.bucket AND a.ticker < b.ticker
  GROUP BY 1, 2),
v AS (
  SELECT ticker_a, ticker_b, n_steps,
    sxx / CAST(n_steps AS DOUBLE) -
      (sx / CAST(n_steps AS DOUBLE)) * (sx / CAST(n_steps AS DOUBLE))
      AS va,
    syy / CAST(n_steps AS DOUBLE) -
      (sy / CAST(n_steps AS DOUBLE)) * (sy / CAST(n_steps AS DOUBLE))
      AS vb,
    sxy / CAST(n_steps AS DOUBLE) -
      (sx / CAST(n_steps AS DOUBLE)) * (sy / CAST(n_steps AS DOUBLE))
      AS cab
  FROM m),
w AS (
  SELECT ticker_a, ticker_b, n_steps, va, vb, cab,
    (vb - cab) / (CASE WHEN va + vb - 2.0 * cab <> 0.0
      THEN va + vb - 2.0 * cab END) AS w_a
  FROM v)
SELECT ticker_a, ticker_b, n_steps, round(w_a, 6) AS w_a,
  round(va * w_a * w_a + vb * (1.0 - w_a) * (1.0 - w_a) +
    2.0 * cab * w_a * (1.0 - w_a), 6) AS var_min,
  round(1.0 - (va * w_a * w_a + vb * (1.0 - w_a) * (1.0 - w_a) +
    2.0 * cab * w_a * (1.0 - w_a)) /
    (CASE WHEN least(va, vb) <> 0.0 THEN least(va, vb) END), 6)
    AS var_reduction
FROM w ORDER BY ticker_a, ticker_b"""),
    // triple-barrier labels: generated lead chain + the SHARED
    // first-touch CASE kernels (up wins at the same bar)
    "stock_triple_barrier" -> (barsCte + {
      val h = graft.operators.TimeSeries.TbHorizon
      val leads = (1 to h)
        .map(k => s"lead(close, $k) OVER tw AS ld$k").mkString(",\n    ")
      val rrs = (1 to h)
        .map(k => s"ld$k / (CASE WHEN close <> 0.0 THEN close END)" +
          s" - 1.0 AS rr$k")
        .mkString(",\n    ")
      val ks = graft.operators.TimeSeries.tbKernels.toMap
      s""",
wl AS (
  SELECT ticker, bucket, close,
    $leads
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)),
wr AS (
  SELECT ticker, bucket,
    $rrs
  FROM wl WHERE ld$h IS NOT NULL)
SELECT ticker, bucket,
  (${ks("label")}) AS label,
  (${ks("t_hit")}) AS t_hit,
  round((${ks("hit_ret")}), 6) AS hit_ret
FROM wr ORDER BY ticker, bucket"""
    }),
    // spectral entropy: Goertzel DFT power at the fixed period grid,
    // round-10 cos/sin products, round-12 entropy terms, argmax peak
    "stock_spectral_entropy" -> (barsCte + {
      val twoPi = (2 * math.Pi).toString
      val branches = graft.operators.TimeSeries.SpecPeriods.map { p =>
        s"""SELECT ticker, n_rets, $p::BIGINT AS period,
  (a * a + b * b) AS power FROM (
  SELECT ticker, max(n_rets) AS n_rets,
    CAST(CAST(sum(CAST(round(xc * cos($twoPi * CAST(t % $p AS DOUBLE) /
      ${p.toDouble}), 10) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS a,
    CAST(CAST(sum(CAST(round(xc * sin($twoPi * CAST(t % $p AS DOUBLE) /
      ${p.toDouble}), 10) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS b
  FROM based GROUP BY ticker)"""
      }.mkString("\nUNION ALL\n")
      s""",
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
rt AS (
  SELECT ticker, r, (row_number() OVER tw2 - 1)::BIGINT AS t
  FROM rets WINDOW tw2 AS (PARTITION BY ticker ORDER BY bucket)),
means AS (
  SELECT ticker, count(*)::BIGINT AS n_rets,
    CAST(CAST(sum(CAST(r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sr
  FROM rt GROUP BY 1),
based AS (
  SELECT rt.ticker, m.n_rets, rt.t,
    rt.r - m.sr / CAST(m.n_rets AS DOUBLE) AS xc
  FROM rt JOIN means m ON rt.ticker = m.ticker),
powers AS (
$branches),
tot AS (
  SELECT ticker,
    CAST(CAST(sum(CAST(round(power, 10) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
      AS ptot
  FROM powers GROUP BY 1),
shares AS (
  SELECT p.ticker, p.n_rets, p.period,
    p.power / (CASE WHEN t.ptot > 0.0 THEN t.ptot END) AS s
  FROM powers p JOIN tot t ON p.ticker = t.ticker),
ent AS (
  SELECT ticker, max(n_rets) AS n_rets,
    CAST(CAST(sum(CAST(coalesce(CASE WHEN s > 0.0
      THEN round(-(s * ln(s)), 12) END, 0.0) AS DECIMAL(28,12)))
      AS VARCHAR) AS DOUBLE) AS h
  FROM shares GROUP BY 1),
pk AS (
  SELECT ticker, period AS peak_period, round(s, 6) AS peak_share
  FROM (SELECT *, row_number() OVER (PARTITION BY ticker
      ORDER BY s DESC, period) AS rn FROM shares)
  WHERE rn = 1)
SELECT e.ticker, e.n_rets, round(e.h, 6) AS spec_entropy,
  round(e.h / ${graft.operators.TimeSeries.seLnP}, 6) AS se_norm,
  pk.peak_period, pk.peak_share
FROM ent e JOIN pk ON e.ticker = pk.ticker
ORDER BY e.ticker"""
    }),
    // Granger causality per ordered ticker pair: effect's return on
    // own lag + cause's lag, 2x2 closed-form solve, F vs the
    // restricted own-lag model; decimal moment sums, pinned algebra
    "stock_granger" -> (barsCte + """,
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
aligned AS (
  SELECT c.ticker AS cause, e.ticker AS effect, c.bucket,
    e.r AS y, c.r AS rc
  FROM rets c JOIN rets e ON c.bucket = e.bucket
  WHERE c.ticker <> e.ticker),
lagged AS (
  SELECT cause, effect, y, x1, x2 FROM (
    SELECT cause, effect, y,
      lag(y, 1) OVER pw AS x1, lag(rc, 1) OVER pw AS x2
    FROM aligned
    WINDOW pw AS (PARTITION BY cause, effect ORDER BY bucket))
  WHERE x1 IS NOT NULL AND x2 IS NOT NULL),
m AS (
  SELECT cause, effect, count(*)::BIGINT AS n_steps,
    CAST(CAST(sum(CAST(x1 AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sx1,
    CAST(CAST(sum(CAST(x2 AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sx2,
    CAST(CAST(sum(CAST(y AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(sum(CAST(x1 * x1 AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sx1x1,
    CAST(CAST(sum(CAST(x1 * x2 AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sx1x2,
    CAST(CAST(sum(CAST(x2 * x2 AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sx2x2,
    CAST(CAST(sum(CAST(x1 * y AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sx1y,
    CAST(CAST(sum(CAST(x2 * y AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sx2y,
    CAST(CAST(sum(CAST(y * y AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS syy
  FROM lagged GROUP BY 1, 2),
cen AS (
  SELECT cause, effect, n_steps,
    sx1x1 - sx1 * sx1 / CAST(n_steps AS DOUBLE) AS s11,
    sx1x2 - sx1 * sx2 / CAST(n_steps AS DOUBLE) AS s12,
    sx2x2 - sx2 * sx2 / CAST(n_steps AS DOUBLE) AS s22,
    sx1y - sx1 * sy / CAST(n_steps AS DOUBLE) AS s1y,
    sx2y - sx2 * sy / CAST(n_steps AS DOUBLE) AS s2y,
    syy - sy * sy / CAST(n_steps AS DOUBLE) AS syy_c
  FROM m),
sol AS (
  SELECT cause, effect, n_steps, s1y, s2y, syy_c, s11,
    (s1y * s22 - s2y * s12) /
      (CASE WHEN n_steps > 2 AND s11 * s22 - s12 * s12 <> 0.0
        THEN s11 * s22 - s12 * s12 END) AS b1,
    (s2y * s11 - s1y * s12) /
      (CASE WHEN n_steps > 2 AND s11 * s22 - s12 * s12 <> 0.0
        THEN s11 * s22 - s12 * s12 END) AS b2
  FROM cen),
fin AS (
  SELECT cause, effect, n_steps, b2,
    syy_c - b1 * s1y - b2 * s2y AS rss_u,
    syy_c - s1y * s1y /
      (CASE WHEN s11 <> 0.0 THEN s11 END) AS rss_r
  FROM sol)
SELECT cause, effect, n_steps,
  round(b2, 6) AS beta_cross,
  round(CASE WHEN n_steps > 3 THEN (rss_r - rss_u) /
    ((CASE WHEN rss_u <> 0.0 THEN rss_u END) /
      CAST(n_steps - 3 AS DOUBLE)) END, 6) AS f_stat
FROM fin ORDER BY cause, effect"""),
    // Engle ARCH(1) LM test: squared returns on their lag, DECIMAL
    // (38,18) moment sums, pinned slope/R2/LM with guarded divisors
    "stock_arch_lm" -> (barsCte + """,
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
pairs AS (
  SELECT ticker, y, lag(y, 1) OVER tw2 AS x
  FROM (SELECT ticker, bucket, r * r AS y FROM rets)
  WINDOW tw2 AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY x IS NOT NULL),
m AS (
  SELECT ticker, count(*)::BIGINT AS n_pairs,
    CAST(CAST(sum(CAST(x AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(sum(CAST(y AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sxx,
    CAST(CAST(sum(CAST(y * y AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS syy,
    CAST(CAST(sum(CAST(x * y AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sxy
  FROM pairs GROUP BY 1)
SELECT ticker, n_pairs,
  round((sxy - sx * sy / CAST(n_pairs AS DOUBLE)) /
    (CASE WHEN sxx - sx * sx / CAST(n_pairs AS DOUBLE) <> 0.0
      THEN sxx - sx * sx / CAST(n_pairs AS DOUBLE) END), 6)
    AS arch_slope,
  round(((sxy - sx * sy / CAST(n_pairs AS DOUBLE)) *
      (sxy - sx * sy / CAST(n_pairs AS DOUBLE))) /
    (CASE WHEN (sxx - sx * sx / CAST(n_pairs AS DOUBLE)) *
        (syy - sy * sy / CAST(n_pairs AS DOUBLE)) <> 0.0
      THEN (sxx - sx * sx / CAST(n_pairs AS DOUBLE)) *
        (syy - sy * sy / CAST(n_pairs AS DOUBLE)) END), 6) AS r2,
  round(CAST(n_pairs AS DOUBLE) *
    (((sxy - sx * sy / CAST(n_pairs AS DOUBLE)) *
      (sxy - sx * sy / CAST(n_pairs AS DOUBLE))) /
    (CASE WHEN (sxx - sx * sx / CAST(n_pairs AS DOUBLE)) *
        (syy - sy * sy / CAST(n_pairs AS DOUBLE)) <> 0.0
      THEN (sxx - sx * sx / CAST(n_pairs AS DOUBLE)) *
        (syy - sy * sy / CAST(n_pairs AS DOUBLE)) END)), 6) AS lm_stat
FROM m ORDER BY ticker"""),
    // PACF via Durbin-Levinson: decimal moment sums, then the SAME
    // generated stage expressions the Spark side selectExpr's — one
    // CTE per stage, so the recursion's double algebra is textually
    // pinned across engines
    "stock_pacf" -> (barsCte + {
      val lags = graft.operators.TimeSeries.AcfLags
      val lagCols = lags
        .map(k => s"lag(r, $k) OVER tw2 AS rl$k").mkString(",\n    ")
      val moments = lags.map { k =>
        s"""    CAST(CAST(sum(CAST(r * rl$k AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS p$k,
    CAST(CAST(sum(CAST(CASE WHEN rl$k IS NOT NULL THEN r END
      AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS a$k,
    CAST(CAST(sum(CAST(rl$k AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS b$k,
    count(rl$k)::BIGINT AS n$k"""
      }.mkString(",\n")
      val stages = graft.operators.TimeSeries.pacfStages
      val stageCtes = stages.zipWithIndex.map { case (stage, i) =>
        val prev = if (i == 0) "m" else s"s$i"
        val cols = stage
          .map { case (n, e) => s"($e) AS $n" }.mkString(",\n    ")
        s"s${i + 1} AS (\n  SELECT *,\n    $cols\n  FROM $prev)"
      }.mkString(",\n")
      val last = s"s${stages.length}"
      val branches = lags.map { k =>
        s"SELECT ticker, $k::BIGINT AS lag, n$k AS n_pairs,\n" +
          s"  round(phi_${k}_$k, 6) AS pacf FROM $last"
      }.mkString("\nUNION ALL\n")
      s""",
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
withlags AS (
  SELECT ticker, r,
    $lagCols
  FROM rets
  WINDOW tw2 AS (PARTITION BY ticker ORDER BY bucket)),
m AS (
  SELECT ticker, count(*)::BIGINT AS n_rets,
    CAST(CAST(sum(CAST(r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS s,
    CAST(CAST(sum(CAST(r * r AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS p0,
$moments
  FROM withlags GROUP BY 1),
$stageCtes
$branches
ORDER BY ticker, lag"""
    }),
    // two-sample KS distance per ticker pair: exact integer ECDF
    // numerator max|cum_a*n_b - cum_b*n_a|, one final division
    "stock_ks_pairs" -> (barsCte + """,
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
byval AS (
  SELECT a.ticker AS ticker_a, b.ticker AS ticker_b, v.r,
    CAST(sum(CASE WHEN v.ticker = a.ticker THEN 1 ELSE 0 END)
      AS BIGINT) AS ca,
    CAST(sum(CASE WHEN v.ticker = b.ticker THEN 1 ELSE 0 END)
      AS BIGINT) AS cb
  FROM (SELECT DISTINCT ticker FROM rets) a
  JOIN (SELECT DISTINCT ticker FROM rets) b ON a.ticker < b.ticker
  JOIN rets v ON v.ticker IN (a.ticker, b.ticker)
  GROUP BY 1, 2, 3),
cum AS (
  SELECT ticker_a, ticker_b, r, ca, cb,
    CAST(sum(ca) OVER pw AS BIGINT) AS cum_a,
    CAST(sum(cb) OVER pw AS BIGINT) AS cum_b
  FROM byval
  WINDOW pw AS (PARTITION BY ticker_a, ticker_b ORDER BY r
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
tt AS (
  SELECT ticker_a, ticker_b,
    CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b
  FROM byval GROUP BY 1, 2),
d AS (
  SELECT c.ticker_a, c.ticker_b, max(t.n_a) AS n_a, max(t.n_b) AS n_b,
    max(abs(c.cum_a * t.n_b - c.cum_b * t.n_a))::BIGINT AS d_num
  FROM cum c JOIN tt t USING (ticker_a, ticker_b)
  GROUP BY 1, 2)
SELECT ticker_a, ticker_b, n_a, n_b, d_num,
  round(CAST(d_num AS DOUBLE) /
    (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS ks_d,
  round((CAST(d_num AS DOUBLE) /
    (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) *
    sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) /
      (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))), 6) AS ks_lambda
FROM d ORDER BY ticker_a, ticker_b"""),
    // Wald-Wolfowitz runs test: exact integer run/sign counts, pinned
    // double closed form with NULL-guarded variance root
    "stock_runs_test" -> (barsCte + """,
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
sgns AS (
  SELECT ticker, bucket, sign(r) AS sgn FROM rets WHERE sign(r) <> 0),
flagged AS (
  SELECT ticker, sgn,
    CASE WHEN lag(sgn, 1) OVER tw2 IS NULL
        OR sgn <> lag(sgn, 1) OVER tw2 THEN 1 ELSE 0 END AS chg
  FROM sgns WINDOW tw2 AS (PARTITION BY ticker ORDER BY bucket)),
m AS (
  SELECT ticker, count(*)::BIGINT AS n_obs,
    CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
    CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_minus,
    CAST(sum(chg) AS BIGINT) AS n_runs
  FROM flagged GROUP BY 1)
SELECT ticker, n_obs, n_plus, n_minus, n_runs,
  round(2.0 * CAST(n_plus AS DOUBLE) * CAST(n_minus AS DOUBLE) /
    CAST(n_obs AS DOUBLE) + 1.0, 6) AS expected_runs,
  round((CAST(n_runs AS DOUBLE) -
    (2.0 * CAST(n_plus AS DOUBLE) * CAST(n_minus AS DOUBLE) /
      CAST(n_obs AS DOUBLE) + 1.0)) /
    (CASE WHEN (2.0 * CAST(n_plus AS DOUBLE) * CAST(n_minus AS DOUBLE))
        * ((2.0 * CAST(n_plus AS DOUBLE) * CAST(n_minus AS DOUBLE))
          - CAST(n_obs AS DOUBLE)) /
        ((CAST(n_obs AS DOUBLE) * CAST(n_obs AS DOUBLE))
          * (CAST(n_obs AS DOUBLE) - 1.0)) > 0.0
      THEN sqrt((2.0 * CAST(n_plus AS DOUBLE) * CAST(n_minus AS DOUBLE))
        * ((2.0 * CAST(n_plus AS DOUBLE) * CAST(n_minus AS DOUBLE))
          - CAST(n_obs AS DOUBLE)) /
        ((CAST(n_obs AS DOUBLE) * CAST(n_obs AS DOUBLE))
          * (CAST(n_obs AS DOUBLE) - 1.0))) END), 6) AS z_score
FROM m ORDER BY ticker"""),
    "stock_corr_pairs" -> (barsCte + """,
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS ret
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY ret IS NOT NULL)
SELECT a.ticker AS ticker_a, b.ticker AS ticker_b,
  count(*)::BIGINT AS n_buckets,
  round(corr(a.ret, b.ret), 6) AS ret_corr
FROM rets a JOIN rets b ON a.bucket = b.bucket AND a.ticker < b.ticker
GROUP BY 1, 2
ORDER BY ticker_a, ticker_b"""),
    // CUSUM change-point screen: exact DECIMAL(38,18) running sums
    // (window float sums diverge between engines), exact-decimal
    // argmax probe with a min-bucket tie rule, VARCHAR crossings on
    // every decimal<->double boundary
    "stock_cusum_breaks" -> (barsCte + """,
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL),
m AS (
  SELECT ticker, count(*)::BIGINT AS n_rets,
    CAST(CAST(sum(CAST(CAST(r AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS s1,
    CAST(CAST(sum(CAST(CAST(r * r AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS s2
  FROM rets GROUP BY 1),
st AS (
  SELECT ticker, n_rets,
    s1 / CAST(n_rets AS DOUBLE) AS mu,
    sqrt(greatest(s2 / CAST(n_rets AS DOUBLE) -
      s1 / CAST(n_rets AS DOUBLE) * (s1 / CAST(n_rets AS DOUBLE)),
      0.0)) AS sd
  FROM m),
cum AS (
  SELECT r.ticker, r.bucket, st.n_rets, st.sd,
    abs(sum(CAST(CAST(r.r - st.mu AS VARCHAR) AS DECIMAL(38,18)))
      OVER (PARTITION BY r.ticker ORDER BY r.bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_abs
  FROM rets r JOIN st USING (ticker)),
pk AS (SELECT ticker, max(s_abs) AS s_max FROM cum GROUP BY 1)
SELECT c.ticker, max(c.n_rets) AS n_rets,
  min(c.bucket) AS break_bucket,
  round(CAST(CAST(max(p.s_max) AS VARCHAR) AS DOUBLE), 6) AS cusum_max,
  CASE WHEN max(c.sd) > 0.0 THEN
    round(CAST(CAST(max(p.s_max) AS VARCHAR) AS DOUBLE) /
      (max(c.sd) * sqrt(CAST(max(c.n_rets) AS DOUBLE))), 6) END
    AS cusum_stat
FROM cum c JOIN pk p ON c.ticker = p.ticker AND c.s_abs = p.s_max
GROUP BY c.ticker ORDER BY c.ticker"""),
    // lead-lag correlation: bucket-shift equi-join, native corr
    // (parity proven by stock_corr_pairs), NaN->NULL on both engines
    "stock_lead_lag" -> (barsCte + """,
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS ret
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY ret IS NOT NULL)
SELECT a.ticker AS ticker_lead, b.ticker AS ticker_lag,
  count(*)::BIGINT AS n_buckets,
  round(corr(a.ret, b.ret), 6) AS lead_corr
FROM rets a JOIN rets b
  ON b.bucket = a.bucket + INTERVAL 5 MINUTE AND a.ticker <> b.ticker
GROUP BY 1, 2
ORDER BY ticker_lead, ticker_lag"""),
    // Hurst exponent via variance-time: per-k block sums on the
    // DECIMAL(38,18) grid, closed-form log-log slope with the literal
    // centred-abscissa weights; the 5·ln²2 denominator interpolates
    // the shared Scala constant via Double.toString so both engines
    // parse the identical IEEE double. The decimal grid here rides
    // VARCHAR on both crossings: Spark's double→decimal cast goes
    // through the SHORTEST decimal repr (Double.toString) while
    // DuckDB's native cast rounds the exact binary expansion — at the
    // 1e6 magnitudes of these squared block sums that sub-ulp gap can
    // straddle a double boundary. double→VARCHAR→DECIMAL reproduces
    // Spark's shortest-repr cast; DECIMAL→VARCHAR→DOUBLE reproduces
    // Java's correctly-rounded BigDecimal.doubleValue (DuckDB's
    // native decimal→double double-rounds via int128).
    "stock_hurst" -> (barsCte + {
      val fiveLn2 = graft.operators.TimeSeries.HurstFiveLn2.toString
      def dsum(c: String) =
        s"CAST(CAST(sum(CAST(CAST($c AS VARCHAR) AS DECIMAL(38,18)))" +
          " AS VARCHAR) AS DOUBLE)"
      val perK = graft.operators.TimeSeries.HurstKs.map { k =>
        s"""
SELECT ticker, $k AS k, n_blocks,
  syy / n_blocks - sy / n_blocks * (sy / n_blocks) AS v
FROM (
  SELECT ticker, count(*)::BIGINT AS n_blocks,
    ${dsum("y")} AS sy,
    ${dsum("y * y")} AS syy
  FROM (
    SELECT ticker, (idx - 1) // $k AS blk, count(*) AS cnt,
      ${dsum("r")} AS y
    FROM rets GROUP BY 1, 2)
  WHERE cnt = $k
  GROUP BY 1)"""
      }.mkString("\nUNION ALL")
      s""",
rets AS (
  SELECT ticker, r,
    CAST(row_number() OVER (PARTITION BY ticker ORDER BY bucket)
      AS BIGINT) AS idx
  FROM (
    SELECT ticker, bucket,
      CASE WHEN lag(close, 1) OVER tw <> 0
        THEN close / lag(close, 1) OVER tw - 1 END AS r
    FROM bars
    WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
    QUALIFY r IS NOT NULL)),
perk AS ($perK),
p AS (
  SELECT ticker,
    max(CASE WHEN k = 1 THEN n_blocks END) AS n_rets,
    max(CASE WHEN k = 8 THEN n_blocks END) AS n8,
    max(CASE WHEN k = 1 THEN v END) AS v1,
    max(CASE WHEN k = 2 THEN v END) AS v2,
    max(CASE WHEN k = 4 THEN v END) AS v4,
    max(CASE WHEN k = 8 THEN v END) AS v8
  FROM perk GROUP BY 1)
SELECT ticker, n_rets,
  v1 AS var_1, v2 AS var_2, v4 AS var_4, v8 AS var_8,
  CASE WHEN n8 >= 2 AND v1 > 0.0 AND v2 > 0.0 AND v4 > 0.0
      AND v8 > 0.0 THEN
    round((-1.5 * ln(v1) - 0.5 * ln(v2) + 0.5 * ln(v4)
      + 1.5 * ln(v8)) / $fiveLn2 / 2.0, 6) END AS hurst
FROM p ORDER BY ticker"""
    }),
    // Kyle lambda: |5-min return| on sqrt(bar dollar volume) OLS via
    // the exact decimal-grid moment recipe; the slope expression is
    // restated verbatim inside the intercept so both engines compute
    // the identical IEEE value
    "stock_kyle_lambda" -> """
WITH stock AS (
  SELECT event_type AS ticker, ts::TIMESTAMP AS ts,
    value::DOUBLE AS price,
    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS volume
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
    AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL),
bars AS (
  SELECT ticker,
    make_timestamp((epoch_us(ts::TIMESTAMP) // 300000000) * 300000000)
      AS bucket,
    max_by(price, ts) AS close,
    CAST(CAST(sum(CAST(price * volume AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS dv
  FROM stock GROUP BY 1, 2),
pairs AS (
  SELECT ticker,
    CASE WHEN lag(close, 1) OVER tw <> 0 AND dv > 0
      THEN abs(close / lag(close, 1) OVER tw - 1) END AS y,
    CASE WHEN dv > 0 THEN sqrt(dv) END AS x
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY y IS NOT NULL AND x IS NOT NULL),
m AS (
  SELECT ticker, count(*)::BIGINT AS n_bars,
    CAST(CAST(sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(sum(CAST(CAST(x * x AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sxx,
    CAST(CAST(sum(CAST(CAST(y AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(sum(CAST(CAST(x * y AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sxy
  FROM pairs GROUP BY 1)
SELECT ticker, n_bars,
  CASE WHEN n_bars > 1 AND
      CAST(n_bars AS DOUBLE) * sxx - sx * sx <> 0.0 THEN
    round((CAST(n_bars AS DOUBLE) * sxy - sx * sy) /
      (CAST(n_bars AS DOUBLE) * sxx - sx * sx) * 1000000.0, 6)
  END AS kyle_lambda_x1m,
  CASE WHEN n_bars > 1 AND
      CAST(n_bars AS DOUBLE) * sxx - sx * sx <> 0.0 THEN
    round((sy - (CAST(n_bars AS DOUBLE) * sxy - sx * sy) /
      (CAST(n_bars AS DOUBLE) * sxx - sx * sx) * sx) /
      CAST(n_bars AS DOUBLE) * 10000.0, 6)
  END AS intercept_bps
FROM m ORDER BY ticker""",
    // OU mean-reversion half-life: the kyle exact-moment OLS recipe on
    // (prev close, delta close); VARCHAR-mediated decimal crossings
    // (close-level moments reach 1e8 where native casts diverge sub-ulp)
    "stock_ou_halflife" -> (barsCte + s""",
pairs AS (
  SELECT ticker,
    lag(close, 1) OVER tw AS x,
    close - lag(close, 1) OVER tw AS y
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY x IS NOT NULL),
m AS (
  SELECT ticker, count(*)::BIGINT AS n_pairs,
    CAST(CAST(sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(sum(CAST(CAST(x * x AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sxx,
    CAST(CAST(sum(CAST(CAST(y AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(sum(CAST(CAST(x * y AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sxy
  FROM pairs GROUP BY 1)
SELECT ticker, n_pairs,
  CASE WHEN n_pairs > 1 AND
      CAST(n_pairs AS DOUBLE) * sxx - sx * sx <> 0.0 THEN
    round((CAST(n_pairs AS DOUBLE) * sxy - sx * sy) /
      (CAST(n_pairs AS DOUBLE) * sxx - sx * sx), 6)
  END AS ou_b,
  CASE WHEN n_pairs > 1 AND
      CAST(n_pairs AS DOUBLE) * sxx - sx * sx <> 0.0 AND
      (CAST(n_pairs AS DOUBLE) * sxy - sx * sy) /
        (CAST(n_pairs AS DOUBLE) * sxx - sx * sx) > -1.0 AND
      (CAST(n_pairs AS DOUBLE) * sxy - sx * sy) /
        (CAST(n_pairs AS DOUBLE) * sxx - sx * sx) < 0.0 THEN
    round(-ln(2.0) / ln(1.0 +
      (CAST(n_pairs AS DOUBLE) * sxy - sx * sy) /
        (CAST(n_pairs AS DOUBLE) * sxx - sx * sx)), 6)
  END AS half_life_bars
FROM m ORDER BY ticker"""),
    // Hill tail index: row_number-pinned top-|r| set (ties by bucket),
    // decimal ln-sum, pinned-order closing alpha
    "stock_hill_tail" -> (barsCte + {
      val k = graft.operators.TimeSeries.HillK
      s""",
rets AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN abs(close / lag(close, 1) OVER tw - 1) END AS r
  FROM bars
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY r IS NOT NULL AND r > 0.0),
top AS (
  SELECT ticker, r
  FROM rets
  QUALIFY row_number() OVER (PARTITION BY ticker
    ORDER BY r DESC, bucket) <= $k),
m AS (
  SELECT ticker, count(*)::BIGINT AS n_tail, min(r) AS r_k,
    CAST(CAST(sum(CAST(CAST(ln(r) AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sln
  FROM top GROUP BY 1)
SELECT ticker, n_tail, round(r_k, 6) AS r_k,
  CASE WHEN n_tail > 1 AND
      sln - CAST(n_tail AS DOUBLE) * ln(r_k) > 0.0 THEN
    round(CAST(n_tail AS DOUBLE) /
      (sln - CAST(n_tail AS DOUBLE) * ln(r_k)), 6)
  END AS hill_alpha
FROM m ORDER BY ticker"""
    }),
    // Corwin-Schultz high-low spread: two-bar beta/gamma, closed-form
    // alpha, per-ticker decimal-summed means (raw and 0-floored)
    "stock_corwin_schultz" -> (Oracles.stockCte + s""",
ohlc AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    max(price) AS high, min(price) AS low, max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2),
pr AS (
  SELECT ticker, high, low,
    lag(high) OVER tw AS ph, lag(low) OVER tw AS pl
  FROM ohlc
  WINDOW tw AS (PARTITION BY ticker ORDER BY window_timestamp)),
pp AS (SELECT * FROM pr WHERE ph IS NOT NULL AND pl > 0 AND low > 0),
s1 AS (
  SELECT ticker,
    ln(CASE WHEN pl > 0 THEN ph / pl END) AS hl1,
    ln(CASE WHEN low > 0 THEN high / low END) AS hl2,
    ln(CASE WHEN least(pl, low) > 0
      THEN greatest(ph, high) / least(pl, low) END) AS gl
  FROM pp),
s2 AS (SELECT ticker, hl1 * hl1 + hl2 * hl2 AS beta, gl * gl AS gamma
  FROM s1),
s3 AS (
  SELECT ticker,
    (sqrt(2.0 * beta) - sqrt(beta)) / (3 - 2 * sqrt(2.0)) -
      sqrt(gamma / (3 - 2 * sqrt(2.0))) AS alpha
  FROM s2),
s4 AS (SELECT ticker,
  2.0 * (exp(alpha) - 1) / (1.0 + exp(alpha)) AS s FROM s3)
SELECT ticker, count(*)::BIGINT AS n_pairs,
  round(CAST(CAST(sum(CAST(round(s, 12) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) /
    count(*), 6) AS avg_spread_raw,
  round(CAST(CAST(sum(CAST(round(greatest(s, 0.0), 12) AS DECIMAL(38,18)))
    AS VARCHAR) AS DOUBLE) / count(*), 6) AS avg_spread
FROM s4 GROUP BY ticker ORDER BY ticker"""),
    // Parkinson / Rogers-Satchell / close-close volatility panel:
    // positive-price filter, 1e-12-grid terms, decimal sums, guarded
    // closing sqrt/ratio math
    "stock_vol_panel" -> (Oracles.stockCte + """,
ohlc AS (
  SELECT ticker,
    date_trunc('minute', ts) + (5 - minute(ts) % 5) * INTERVAL 1 MINUTE
      AS window_timestamp,
    min_by(price, ts) AS open, max(price) AS high,
    min(price) AS low, max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2),
base AS (
  SELECT ticker, open, high, low, close,
    lag(close, 1) OVER (PARTITION BY ticker ORDER BY window_timestamp)
      AS pc
  FROM ohlc WHERE low > 0 AND open > 0 AND close > 0),
terms AS (
  SELECT ticker,
    round(ln(high / low) * ln(high / low), 12) AS park_t,
    round(ln(high / close) * ln(high / open) +
      ln(low / close) * ln(low / open), 12) AS rs_t,
    round(ln(close / (CASE WHEN pc > 0 THEN pc END)) *
      ln(close / (CASE WHEN pc > 0 THEN pc END)), 12) AS cc_t
  FROM base),
m AS (
  SELECT ticker, count(*)::BIGINT AS n_bars,
    CAST(CAST(sum(CAST(park_t AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sp,
    CAST(CAST(sum(CAST(rs_t AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sr,
    CAST(CAST(sum(CAST(cc_t AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sc,
    count(cc_t)::BIGINT AS nc
  FROM terms GROUP BY ticker)
SELECT ticker, n_bars,
  round(sqrt(sp / n_bars / (4 * ln(2.0))), 6) AS vol_parkinson,
  round(sqrt(greatest(sr / n_bars, 0.0)), 6) AS vol_rogers_satchell,
  CASE WHEN nc > 0 THEN round(sqrt(sc /
    CAST(CASE WHEN nc > 0 THEN nc END AS DOUBLE)), 6) END
    AS vol_close_close,
  CASE WHEN nc > 0 AND sc > 0.0 THEN
    round(sqrt(sp / n_bars / (4 * ln(2.0))) /
      (CASE WHEN sc > 0.0 THEN sqrt(sc /
        CAST(CASE WHEN nc > 0 THEN nc END AS DOUBLE)) END), 6)
  END AS park_cc_ratio
FROM m ORDER BY ticker"""),
    // Epps effect: the corr_pairs recipe at three bar widths
    "stock_epps" -> {
      def block(sec: Int): String = s"""
SELECT $sec::BIGINT AS width_s, ticker_a, ticker_b, n_buckets, ret_corr
FROM (
  SELECT a.ticker AS ticker_a, b.ticker AS ticker_b,
    count(*)::BIGINT AS n_buckets,
    round(corr(a.ret, b.ret), 6) AS ret_corr
  FROM r$sec a JOIN r$sec b
    ON a.bucket = b.bucket AND a.ticker < b.ticker
  GROUP BY 1, 2)"""
      def barsBlock(sec: Int): String = s"""
b$sec AS (
  SELECT ticker,
    make_timestamp((epoch_us(ts::TIMESTAMP) // ${sec}000000)
      * ${sec}000000) AS bucket,
    max_by(price, ts) AS close
  FROM stock GROUP BY 1, 2),
r$sec AS (
  SELECT ticker, bucket,
    CASE WHEN lag(close, 1) OVER tw <> 0
      THEN close / lag(close, 1) OVER tw - 1 END AS ret
  FROM b$sec
  WINDOW tw AS (PARTITION BY ticker ORDER BY bucket)
  QUALIFY ret IS NOT NULL)"""
      val ws = graft.operators.TimeSeries.EppsWidths
      Oracles.stockCte + "," +
        ws.map(barsBlock).mkString(",") + "\n" +
        ws.map(block).mkString("\nUNION ALL\n") +
        "\nORDER BY width_s, ticker_a, ticker_b"
    },
  )
}
