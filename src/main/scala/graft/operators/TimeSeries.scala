package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Materialize.PinOps
import graft.sources.Tables

/** Time-series resampling/smoothing operators over the stock feed — the
  * gap-fill / EWMA / cross-correlation surface any production deployment
  * of the reference's per-minute bars (`analysis-dataflow-pipeline/
  * pipeline.py:87-97`) grows next: charting stacks need dense regular
  * series (gap-fill), signal generation needs exponentially-weighted
  * smoothing (EWMA), and risk/pairs-trading needs the cross-ticker return
  * correlation matrix.
  *
  * Scale notes (100 TB): every operator keys its shuffle on
  * (ticker, time-bucket) — high cardinality over a real symbol universe.
  * The per-ticker windows (forward-fill, lag chains) are the same
  * partition-by-entity pattern as `Relational.userSessions`: at cluster
  * scale the partition key is the symbol, whose per-key row count is
  * bounded by the time span, not the data volume, so no partition
  * outgrows an executor. The gap-fill spine is built from a tiny
  * per-ticker min/max aggregate and EXPLODEd distributively — spine size
  * is O(symbols × span), independent of event volume.
  */
object TimeSeries {

  /** 5-minute close bars per ticker (sparse — only buckets with events).
    * Bucketing via epoch-seconds integer division matches the oracle's
    * `epoch_us // 1e6 // 300 * 300` bit-for-bit (both floor on positive
    * epochs); `max_by(price, ts)` is the roster-wide "last event wins"
    * convention (ts is unique per ticker in the feed — see agg1m). */
  private[graft] def closeBars5m(stock: DataFrame): DataFrame =
    stock
      .groupBy(col("ticker"),
        timestamp_seconds(expr("unix_timestamp(ts) div 300") * 300)
          .as("bucket"))
      .agg(max_by(col("price"), col("ts")).as("close"))

  /** Gap-fill resample: dense per-ticker 5-minute series with the close
    * forward-filled across empty buckets — the resample→ffill every
    * charting/feature stack applies to sparse bars.
    *
    * Shape: sparse bars → per-ticker [min,max] bucket bounds (5 rows) →
    * `sequence()` + `explode` builds the dense spine distributively →
    * left join bars → `last(close, ignoreNulls)` forward-fill window.
    * The spine explode happens AFTER the bounds aggregate, so the full
    * event volume is scanned exactly once. */
  def gapfill(spark: SparkSession, dir: String): DataFrame =
    gapfillBars(closeBars5m(StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def gapfillBars(bars: DataFrame): DataFrame = {
    val spine = bars
      .groupBy(col("ticker"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("ticker"),
        explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 5 MINUTES"))).as("bucket"))
    val ffill = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(bars, Seq("ticker", "bucket"), "left")
      .select(
        col("ticker"), col("bucket"),
        last(col("close"), ignoreNulls = true).over(ffill)
          .as("filled_close"),
        col("close").isNull.as("gap_filled"))
      .orderBy(col("ticker"), col("bucket"))
  }

  /** EWMA weights: span-12 smoothing (alpha = 2/(span+1)) truncated to a
    * 12-term trailing kernel. The closed form is written as an explicit
    * lag-chain — 12 `lag` terms with fixed literal weights — rather than
    * a collect_list fold: every term is a codegen'd column expression
    * (stays inside WholeStageCodegen, no array allocation per row), and
    * the summation order is the textual order of the `+` chain, which the
    * oracle SQL states identically, so the doubles agree bit-for-bit. */
  private val EwmaSpan = 12
  private val EwmaAlpha = 2.0 / (EwmaSpan + 1)

  /** Per-ticker EWMA of the 5-minute close over the sparse bars.
    * Leading edge: lags before the series start are NULL; each NULL term
    * contributes zero weight, so early rows are a correctly-renormalized
    * partial kernel (pandas `ewm(adjust=True)` semantics, truncated). */
  def ewma(spark: SparkSession, dir: String): DataFrame =
    ewmaBars(closeBars5m(StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def ewmaBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val decay = 1.0 - EwmaAlpha
    // num = Σ_i (1-α)^i·x_{t-i}, den = Σ_i (1-α)^i·[x_{t-i} exists]
    val terms = (0 until EwmaSpan).map { i =>
      val weight = math.pow(decay, i)
      val x = lag(col("close"), i).over(w)
      (when(x.isNotNull, x * lit(weight)).otherwise(lit(0.0)),
        when(x.isNotNull, lit(weight)).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    bars
      .select(col("ticker"), col("bucket"), col("close"),
        round(num / den, 6).as("ewma_12"))
      .orderBy(col("ticker"), col("bucket"))
  }

  /** Pairwise ticker-return correlation — the cross-sectional matrix a
    * pairs-trading / risk stack derives from the bar feed. Per-ticker
    * 5-minute log-ish simple returns (close/lag(close)−1) self-joined on
    * the bucket (equi join — both sides shuffle once on `bucket`), then
    * one hash-aggregate per unordered pair. Output is the strict upper
    * triangle (ticker_a < ticker_b). Degenerate pairs (constant series →
    * NaN corr) surface as NULL, the roster-wide convention. */
  def corrPairs(spark: SparkSession, dir: String): DataFrame =
    corrPairsBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def corrPairsBars(bars: DataFrame): DataFrame = {
    // the ≠0 guard in simpleRets: a zero close (a valid price in the
    // feed) would otherwise throw DIVIDE_BY_ZERO under Spark 4's ANSI
    // default — the row drops like the leading NULL, and the oracle
    // states the identical CASE (DuckDB would silently produce ±inf)
    val rets = simpleRets(bars, "ret")
    val a = rets.select(col("ticker").as("ticker_a"), col("bucket"),
      col("ret").as("ret_a"))
    val b = rets.select(col("ticker").as("ticker_b"), col("bucket"),
      col("ret").as("ret_b"))
    a.join(b, Seq("bucket"))
      .filter(col("ticker_a") < col("ticker_b"))
      .groupBy(col("ticker_a"), col("ticker_b"))
      .agg(
        count(lit(1)).as("n_buckets"),
        round(nanToNull(corr(col("ret_a"), col("ret_b"))), 6)
          .as("ret_corr"))
      .orderBy(col("ticker_a"), col("ticker_b"))
  }

  private def nanToNull(c: org.apache.spark.sql.Column) =
    when(isnan(c), lit(null)).otherwise(c)

  /** DECIMAL(38,18)-grid sum cast back to double — the engine's
    * order-independent float accumulator, stated identically by every
    * oracle (which crosses via VARCHAR where magnitudes demand it).
    * One definition; every moment kernel in this file uses it. */
  private def dsum18(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(38,18)")).cast("double")

  /** The shared simple-return block: per-ticker 5-minute returns
    * close/prev − 1 with the ≠0 ANSI guard, leading-NULL rows dropped —
    * (ticker, bucket, <as>). corrPairs/hurst/leadLag/hillTail all
    * derive from THIS definition so a guard fix can never drift
    * between kernels. */
  private def simpleRets(bars: DataFrame, as: String): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val prev = lag(col("close"), 1).over(w)
    bars
      .select(col("ticker"), col("bucket"),
        when(prev =!= 0.0, col("close") / prev - 1).as(as))
      .filter(col(as).isNotNull)
  }

  /** Return-distribution moments per ticker: mean, variance, skewness
    * and excess kurtosis of the 5-minute simple returns — the shape
    * statistics (fat tails, asymmetry) a risk stack reads before
    * trusting any Gaussian assumption. The four power sums accumulate
    * as DECIMAL(38,18) of identically-computed double powers — the
    * cast rounds both engines' IDENTICAL doubles to the same grid, so
    * the sums are exact and order-independent under any partitioning —
    * and only the closed-form moment ratios are double math, in one
    * pinned order. Degenerate series (variance 0, n < 2) yield NULL. */
  def momentStats(spark: SparkSession, dir: String): DataFrame =
    momentsBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def momentsBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val prev = lag(col("close"), 1).over(w)
    val rets = bars
      .select(col("ticker"),
        when(prev =!= 0.0, col("close") / prev - 1).as("r"))
      .filter(col("r").isNotNull)
    val m = rets.groupBy(col("ticker"))
      .agg(count(lit(1)).as("n_rets"),
        dsum18(col("r")).as("s1"),
        dsum18(col("r") * col("r")).as("s2"),
        dsum18(col("r") * col("r") * col("r")).as("s3"),
        dsum18(col("r") * col("r") * col("r") * col("r")).as("s4"))
    val nd = col("n_rets").cast("double")
    val mean = col("s1") / nd
    val variance = col("s2") / nd - mean * mean
    val skew = (col("s3") / nd - lit(3.0) * mean * variance -
      mean * mean * mean) / sqrt(variance * variance * variance)
    val kurt = (col("s4") / nd - lit(4.0) * mean * (col("s3") / nd) +
      lit(6.0) * mean * mean * (col("s2") / nd) -
      lit(3.0) * mean * mean * mean * mean) / (variance * variance) -
      lit(3.0)
    m.select(col("ticker"), col("n_rets"),
        round(mean, 6).as("mean_ret"),
        when(col("n_rets") > 1 && variance > 0.0, round(variance, 6))
          .as("var_ret"),
        when(col("n_rets") > 1 && variance > 0.0, round(skew, 6))
          .as("skew_ret"),
        when(col("n_rets") > 1 && variance > 0.0, round(kurt, 6))
          .as("kurt_excess"))
      .orderBy(col("ticker"))
  }

  /** Amihud illiquidity per ticker: mean(|bar return| / bar dollar
    * volume) × 10⁶ over the 5-minute bars — price impact per traded
    * dollar, the liquidity screen a portfolio stack runs beside
    * volatility. Bar dollar volume and the ratio terms both accumulate
    * through DECIMAL grids (identically-computed double terms →
    * order-independent, bit-equal across engines); only the final
    * mean × 10⁶ is double math, in one pinned order. Bars with zero
    * traded value or no previous close drop, like the roster-wide
    * return convention. */
  def amihud(spark: SparkSession, dir: String): DataFrame =
    amihudBars(StockPipeline.normalize(Tables.events(spark, dir)))

  private[graft] def amihudBars(stock: DataFrame): DataFrame = {
    val bars = stock.groupBy(col("ticker"),
        timestamp_seconds(expr("unix_timestamp(ts) div 300") * 300)
          .as("bucket"))
      .agg(max_by(col("price"), col("ts")).as("close"),
        sum((col("price") * col("volume")).cast("decimal(38,10)"))
          .cast("double").as("dv"))
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val prev = lag(col("close"), 1).over(w)
    val rets = bars.select(col("ticker"),
      when(prev =!= 0.0 && col("dv") > 0.0,
        abs(col("close") / prev - 1) / col("dv")).as("x"))
    val m = rets.groupBy(col("ticker")).agg(
      count(col("x")).as("n_bars"),
      sum(col("x").cast("decimal(38,18)")).cast("double").as("sx"))
    m.select(col("ticker"), col("n_bars"),
        when(col("n_bars") > 0,
          round(col("sx") / col("n_bars") * lit(1000000.0), 6))
          .as("amihud_x1m"))
      .orderBy(col("ticker"))
  }

  /** Jump detection via bipower variation per ticker (Barndorff-
    * Nielsen–Shephard): realized variance Σr² captures the whole
    * price path including jumps, while the bipower variation
    * (π/2)·Σ|r_t||r_{t−1}| is robust to them — their gap, reported
    * as jump_share = max(0, 1 − BV/RV), is the fraction of variance
    * attributable to discontinuous moves (a high share means the
    * ticker's risk is event-driven, not diffusive). Same lag-pair
    * window as [[rollSpreadBars]]; both sums go through the
    * DECIMAL(38,18) grid; π/2 interpolates as the Scala double so
    * both engines scale by the bit-identical constant. */
  def jumpDetection(spark: SparkSession, dir: String): DataFrame =
    jumpBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def jumpBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val prev = lag(col("close"), 1).over(w)
    val rets = bars
      .select(col("ticker"), col("bucket"),
        when(prev =!= 0.0, col("close") / prev - 1).as("r"))
      .filter(col("r").isNotNull)
    val withLag = rets
      .select(col("ticker"), col("r"),
        lag(col("r"), 1).over(
          Window.partitionBy(col("ticker")).orderBy(col("bucket")))
          .as("rl"))
    val halfPi = math.Pi / 2
    val m = withLag.groupBy(col("ticker")).agg(
      count(col("r")).as("n_rets"),
      dsum18(col("r") * col("r")).as("rv"),
      dsum18(when(col("rl").isNotNull,
        abs(col("r")) * abs(col("rl")))).as("bvs"))
    // a single-return ticker has an EMPTY bipower sum -> NULL from
    // sum(); state it as 0 (the empty-sum identity) in both engines
    val bv = coalesce(col("bvs"), lit(0.0))
    m.select(col("ticker"), col("n_rets"),
        round(col("rv"), 6).as("realized_var"),
        round(lit(halfPi) * bv, 6).as("bipower_var"),
        when(col("rv") > 0.0,
          round(greatest(lit(0.0),
            lit(1.0) - lit(halfPi) * bv / col("rv")), 6))
          .as("jump_share"))
      .orderBy(col("ticker"))
  }

  /** Autocorrelation lags for [[acf]] — shared with the oracle. */
  val AcfLags = Seq(1, 2, 3, 4, 5)

  /** Return autocorrelation function per ticker at lags 1–5 over the
    * 5-minute simple returns — the Ljung-Box-style serial-dependence
    * profile (a significant lag-k bar means a k-bar momentum/reversal
    * pattern survives in the feed). Each lag is one more window `lag`
    * on the same per-ticker order; the correlation is Pearson on the
    * paired series via `corr` — the established cross-engine
    * aggregate ([[corrPairsBars]] proves round-6 parity). Degenerate
    * pairs (constant series) yield NULL. */
  def acf(spark: SparkSession, dir: String): DataFrame =
    acfBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def acfBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val prev = lag(col("close"), 1).over(w)
    val rets = bars
      .select(col("ticker"), col("bucket"),
        when(prev =!= 0.0, col("close") / prev - 1).as("r"))
      .filter(col("r").isNotNull)
    val perLag = AcfLags.map { k =>
      rets
        .select(col("ticker"), col("r"),
          lag(col("r"), k).over(
            Window.partitionBy(col("ticker")).orderBy(col("bucket")))
            .as("rl"))
        .filter(col("rl").isNotNull)
        .groupBy(col("ticker"))
        .agg(count(lit(1)).as("n_pairs"),
          round(nanToNull(corr(col("r"), col("rl"))), 6).as("acf"))
        .select(col("ticker"), lit(k).cast("long").as("lag"),
          col("n_pairs"), col("acf"))
    }
    perLag.reduce(_ unionAll _).orderBy(col("ticker"), col("lag"))
  }

  /** Roll effective-spread estimator per ticker: 2·√(−cov(Δp_t,
    * Δp_{t−1})) over the 5-minute close changes — bid-ask bounce makes
    * consecutive price changes negatively autocorrelated, and the
    * magnitude of that autocovariance IS the implied spread (Roll
    * 1984). The lagged pair comes from one more lag on the same
    * per-ticker window; cross-product and marginal sums go through the
    * DECIMAL(38,18) grid (order-independent), and the closed form is
    * double math in one pinned order. A non-negative autocovariance
    * has no real-spread solution and yields NULL, stated identically
    * by the oracle. */
  def rollSpread(spark: SparkSession, dir: String): DataFrame =
    rollSpreadBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def rollSpreadBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val d = col("close") - lag(col("close"), 1).over(w)
    val withLags = bars.select(col("ticker"), col("bucket"),
        d.as("dx"))
      .select(col("ticker"),
        col("dx"), lag(col("dx"), 1).over(w).as("dy"))
      .filter(col("dx").isNotNull && col("dy").isNotNull)
    val m = withLags.groupBy(col("ticker")).agg(
      count(lit(1)).as("n_pairs"),
      dsum18(col("dx")).as("sx"), dsum18(col("dy")).as("sy"),
      dsum18(col("dx") * col("dy")).as("sxy"))
    val nd = col("n_pairs").cast("double")
    val cov = col("sxy") / nd - (col("sx") / nd) * (col("sy") / nd)
    m.select(col("ticker"), col("n_pairs"),
        round(cov, 6).as("dcov"),
        when(col("n_pairs") > 1 && cov < 0.0,
          round(lit(2.0) * sqrt(-cov), 6)).as("roll_spread"))
      .orderBy(col("ticker"))
  }

  /** Bartlett-kernel lag depth for [[realizedKernel]] — shared with
    * the oracle generator. */
  val RkLags = 5

  /** Bartlett weight × 2 for lag h: 2·(1 − h/(H+1)). Computed ONCE in
    * Scala so both engines parse the identical IEEE literal (the
    * [[HurstFiveLn2]] convention). */
  def rkWeight2(h: Int): Double = 2.0 * (1.0 - h.toDouble / (RkLags + 1))

  /** Realized-kernel variance per ticker (Barndorff-Nielsen et al.):
    * plain realized variance Σr² is biased upward by microstructure
    * noise (bid-ask bounce makes consecutive returns negatively
    * autocorrelated — the same effect [[rollSpread]] inverts into a
    * spread); the kernel estimate adds Bartlett-weighted
    * autocovariances, RK = γ₀ + Σ_{h=1..H} 2·(1−h/(H+1))·γ_h, which
    * soaks the noise back out. The panel a realized-vol consumer
    * reads next to [[rvSignature]]: rv, rk, and their ratio (< 1 =
    * bounce-dominated, ≈ 1 = noise-free sampling).
    *
    * Determinism: per-lag cross products decimal-sum raw (the
    * [[jumpDetection]] convention — synthetic-price returns reach 1e4
    * magnitudes where a 1e-12 term grid is itself float-lossy);
    * order-independent under any partitioning; the weighted
    * combination is double math in one pinned textual order with the
    * 2·w_h literals interpolated from [[rkWeight2]] on both engines;
    * short series contribute literal-0 autocovariances via coalesce,
    * identically stated. Scale: one window pass for H lags + one hash
    * aggregate — bar-grain, H fixed. */
  def realizedKernel(spark: SparkSession, dir: String): DataFrame =
    realizedKernelBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def realizedKernelBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val prev = lag(col("close"), 1).over(w)
    val rets = bars
      .select(col("ticker"), col("bucket"),
        when(prev =!= 0.0, col("close") / prev - 1).as("r"))
      .filter(col("r").isNotNull)
    val withLags = rets.select(
      col("ticker") +: col("r") +:
        (1 to RkLags).map(h => lag(col("r"), h).over(
          Window.partitionBy(col("ticker")).orderBy(col("bucket")))
          .as(s"rl$h")): _*)
    val aggCols = count(lit(1)).as("n_rets") +:
      dsum18(col("r") * col("r")).as("g0") +:
      (1 to RkLags).map(h =>
        dsum18(col("r") * col(s"rl$h")).as(s"g$h"))
    val m = withLags.groupBy(col("ticker"))
      .agg(aggCols.head, aggCols.tail: _*)
    val rk = (1 to RkLags).foldLeft(col("g0")) { (acc, h) =>
      acc + lit(rkWeight2(h)) * coalesce(col(s"g$h"), lit(0.0))
    }
    m.select(col("ticker"), col("n_rets"),
        round(col("g0"), 6).as("rv"),
        round(rk, 6).as("rk"),
        round(rk / when(col("g0") > 0.0, col("g0")), 6)
          .as("kernel_ratio"))
      .orderBy(col("ticker"))
  }

  /** Garman–Klass / Parkinson range-based volatility per ticker: the
    * OHLC estimators that extract ~5–7× more information per bar than
    * close-to-close variance (range sees the intrabar path). Per-bar
    * terms — ½·ln²(H/L) − (2ln2−1)·ln²(C/O) and ln²(H/L)/(4ln2) —
    * round to the 1e-12 grid and decimal-sum per ticker; the
    * constants interpolate as Scala doubles so both engines parse
    * bit-identical IEEE values. Non-positive prices drop (a log-range
    * needs a positive bar), stated identically by the oracle. */
  def garmanKlass(spark: SparkSession, dir: String): DataFrame =
    gkBars(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def gkBars(ohlc: DataFrame): DataFrame = {
    val k = 2 * math.log(2) - 1
    val p4 = 4 * math.log(2)
    val lhl = log(col("high") / col("low"))
    val lco = log(col("close") / col("open"))
    ohlc.filter(col("low") > 0.0 && col("open") > 0.0)
      .select(col("ticker"),
        round(lit(0.5) * lhl * lhl - lit(k) * lco * lco, 12)
          .cast("decimal(18,12)").as("gk"),
        round(lhl * lhl / lit(p4), 12).cast("decimal(18,12)").as("pk"))
      .groupBy(col("ticker"))
      .agg(count(lit(1)).as("n_bars"),
        round(sum(col("gk")).cast("double") / count(lit(1)), 6)
          .as("gk_var"),
        round(sum(col("pk")).cast("double") / count(lit(1)), 6)
          .as("parkinson_var"))
      .orderBy(col("ticker"))
  }

  /** Sampling intervals (seconds) for [[rvSignature]] — shared with
    * the oracle generator. */
  val RvFreqs = Seq(60, 300, 900)

  /** Realized-volatility signature plot per ticker: the sum of squared
    * simple returns sampled at 1/5/15-minute bars — microstructure
    * noise makes RV blow up as the sampling interval shrinks, so the
    * flat-vs-exploding shape of this curve is the standard "how fast
    * can I sample this feed" diagnostic. Each frequency re-buckets the
    * ticks with the same integer-epoch division as the 5-minute bars;
    * squared-return terms round to the DECIMAL(38,18) grid before the
    * per-ticker sum (order-independent, bit-equal across engines). */
  def rvSignature(spark: SparkSession, dir: String): DataFrame =
    rvSignatureTicks(StockPipeline.normalize(Tables.events(spark, dir)))

  private[graft] def rvSignatureTicks(stock: DataFrame): DataFrame = {
    val perFreq = RvFreqs.map { sec =>
      val bars = stock.groupBy(col("ticker"),
          timestamp_seconds(expr(s"unix_timestamp(ts) div $sec") * sec)
            .as("bucket"))
        .agg(max_by(col("price"), col("ts")).as("close"))
      val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
      val prev = lag(col("close"), 1).over(w)
      bars
        .select(col("ticker"),
          when(prev =!= 0.0, col("close") / prev - 1).as("r"))
        .filter(col("r").isNotNull)
        .groupBy(col("ticker"))
        .agg(count(lit(1)).as("n_rets"),
          sum((col("r") * col("r")).cast("decimal(38,18)"))
            .cast("double").as("rv"))
        .select(col("ticker"), lit(sec / 60).cast("long")
            .as("freq_minutes"),
          col("n_rets"), round(col("rv"), 6).as("realized_var"))
    }
    perFreq.reduce(_ unionAll _)
      .orderBy(col("ticker"), col("freq_minutes"))
  }

  /** Overlapping-return horizon for [[varianceRatio]] — shared with
    * the oracle generator. */
  val VrQ = 4

  /** Lo–MacKinlay variance-ratio statistic per ticker: the variance
    * of overlapping [[VrQ]]-bar log returns over VrQ × the one-bar
    * log-return variance — the classic random-walk diagnostic (VR ≈ 1
    * under iid increments, > 1 momentum, < 1 mean reversion). Both
    * series are lag-window log returns on the 5-minute bars (bounded
    * per-ticker partitions); the moment sums accumulate as
    * DECIMAL(38,18) of identically-computed double terms — exact and
    * order-independent under any partitioning — and only the closed-
    * form ratio is double math, in one pinned order. Degenerate
    * tickers (zero one-bar variance, < 2 observations on either
    * horizon) yield NULL. */
  def varianceRatio(spark: SparkSession, dir: String): DataFrame =
    varianceRatioBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def varianceRatioBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val p1 = lag(col("close"), 1).over(w)
    val pq = lag(col("close"), VrQ).over(w)
    // log returns need strictly positive prices on both ends (a zero
    // or negative close is a feed glitch; ln would throw/NaN) — the
    // row drops like the leading NULLs, stated identically by the
    // oracle's CASE
    val rets = bars.select(col("ticker"),
      when(p1 > 0.0 && col("close") > 0.0, log(col("close") / p1))
        .as("r1"),
      when(pq > 0.0 && col("close") > 0.0, log(col("close") / pq))
        .as("rq"))
    val m = rets.groupBy(col("ticker")).agg(
      count(col("r1")).as("n1"), dsum18(col("r1")).as("a1"),
      dsum18(col("r1") * col("r1")).as("b1"),
      count(col("rq")).as("nq"), dsum18(col("rq")).as("aq"),
      dsum18(col("rq") * col("rq")).as("bq"))
    val n1d = col("n1").cast("double")
    val nqd = col("nq").cast("double")
    val v1 = col("b1") / n1d - (col("a1") / n1d) * (col("a1") / n1d)
    val vq = col("bq") / nqd - (col("aq") / nqd) * (col("aq") / nqd)
    m.select(col("ticker"), col("n1"), col("nq"),
        when(col("n1") > 1 && col("nq") > 1 && v1 > 0.0,
          round(vq / (lit(VrQ.toDouble) * v1), 6)).as("variance_ratio"))
      .orderBy(col("ticker"))
  }

  /** Longest up/down streaks per ticker — the gaps-and-islands
    * momentum statistic (flat bars and the leading edge break a
    * streak). Islands come from the classic difference-of-row_numbers
    * trick over the per-ticker bar order — pure integer arithmetic,
    * both windows partition by ticker (bounded by the time span), and
    * the output is one row per ticker. */
  def streaks(spark: SparkSession, dir: String): DataFrame = {
    val bars = closeBars5m(StockPipeline.normalize(Tables.events(spark, dir)))
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val prev = lag(col("close"), 1).over(w)
    val signed = bars.select(col("ticker"), col("bucket"),
      when(prev.isNull, 0)
        .when(col("close") > prev, 1)
        .when(col("close") < prev, -1)
        .otherwise(0).as("sgn"))
    val ws = Window.partitionBy(col("ticker"), col("sgn"))
      .orderBy(col("bucket"))
    val runs = signed
      .withColumn("grp",
        row_number().over(w) - row_number().over(ws))
      .filter(col("sgn") =!= 0)
      .groupBy(col("ticker"), col("sgn"), col("grp"))
      .agg(count(lit(1)).as("len"))
    runs.groupBy(col("ticker"))
      .agg(max(when(col("sgn") === 1, col("len"))).as("max_up_streak"),
        max(when(col("sgn") === -1, col("len"))).as("max_down_streak"),
        sum(when(col("sgn") === 1, col("len")).otherwise(lit(0L)))
          .as("n_up_moves"),
        sum(when(col("sgn") === -1, col("len")).otherwise(lit(0L)))
          .as("n_down_moves"))
      .orderBy(col("ticker"))
  }

  /** Sharpe and Sortino ratios per ticker (zero risk-free rate, bucket
    * grain): mean return over total and DOWNSIDE deviation — the
    * risk-adjusted-return pair. All moments are decimal-exact sums
    * (including the conditional negative-side second moment), so the
    * ratios are pinned double math over identical inputs; tickers
    * without enough observations or with zero deviation yield NULL. */
  def sharpe(spark: SparkSession, dir: String): DataFrame = {
    val bars = closeBars5m(StockPipeline.normalize(Tables.events(spark, dir)))
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val prev = lag(col("close"), 1).over(w)
    val rets = bars
      .select(col("ticker"),
        when(prev =!= 0.0, col("close") / prev - 1).as("r"))
      .filter(col("r").isNotNull)
    def d18(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,18)")).cast("double")
    val m = rets.groupBy(col("ticker"))
      .agg(count(lit(1)).as("n_rets"),
        d18(col("r")).as("s1"), d18(col("r") * col("r")).as("s2"),
        d18(when(col("r") < 0.0, col("r") * col("r"))
          .otherwise(lit(0.0))).as("s2d"))
    val nd = col("n_rets").cast("double")
    val mean = col("s1") / nd
    val sd = sqrt(greatest(col("s2") / nd - mean * mean, lit(0.0)))
    val dd = sqrt(col("s2d") / nd)
    m.select(col("ticker"), col("n_rets"),
        round(mean, 6).as("mean_ret"),
        when(col("n_rets") >= VarMinObs && sd > 0.0,
          round(mean / sd, 6)).as("sharpe"),
        when(col("n_rets") >= VarMinObs && dd > 0.0,
          round(mean / dd, 6)).as("sortino"))
      .orderBy(col("ticker"))
  }

  /** CAPM beta/alpha per ticker against the equal-weight market: the
    * market return per bucket is the decimal-exact mean of all tickers
    * trading that bucket, and each ticker's beta = cov(r, m)/var(m)
    * and per-bucket alpha come from exact decimal moment sums (the
    * [[momentStats]]/regrTrend discipline — products of identical
    * doubles cast to a fixed decimal grid, summed order-independently)
    * with only the closed forms in double math. Tickers need
    * [[VarMinObs]] joint observations; degenerate market variance
    * yields NULL. */
  def beta(spark: SparkSession, dir: String): DataFrame = {
    val bars = closeBars5m(StockPipeline.normalize(Tables.events(spark, dir)))
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val prev = lag(col("close"), 1).over(w)
    val rets = bars
      .select(col("ticker"), col("bucket"),
        when(prev =!= 0.0, col("close") / prev - 1).as("r"))
      .filter(col("r").isNotNull)
    val market = rets.groupBy(col("bucket"))
      .agg((sum(col("r").cast("decimal(28,14)")).cast("double") /
        count(lit(1))).as("m"))
    def d18(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,18)")).cast("double")
    val mo = rets.join(market, Seq("bucket"))
      .groupBy(col("ticker"))
      .agg(count(lit(1)).as("n_obs"),
        d18(col("r")).as("sr"), d18(col("m")).as("sm"),
        d18(col("r") * col("m")).as("srm"),
        d18(col("m") * col("m")).as("smm"))
    val nd = col("n_obs").cast("double")
    val den = nd * col("smm") - col("sm") * col("sm")
    val b = (nd * col("srm") - col("sr") * col("sm")) / den
    mo.select(col("ticker"), col("n_obs"),
        when(col("n_obs") >= VarMinObs && den =!= 0.0, round(b, 6))
          .as("beta"),
        when(col("n_obs") >= VarMinObs && den =!= 0.0,
          round((col("sr") - b * col("sm")) / nd, 6)).as("alpha"))
      .orderBy(col("ticker"))
  }

  /** Historical VaR / Expected Shortfall per ticker at the 5% level:
    * the loss-tail risk pair every market-risk report leads with. The
    * 5% return quantile comes from the exact banded-percentile
    * machinery ([[Quantiles.exactPercentilesBy]] — distinct-value
    * scan, no global sort); the tail mean (ES) is a decimal-exact
    * conditional sum below the ROUNDED VaR cutoff, so the tail
    * membership test is the same 6-decimal value in both engines.
    * Tickers with fewer than [[VarMinObs]] returns yield NULLs (a
    * 5%-tail of nothing isn't a statistic). */
  val VarLevel = 0.05
  val VarMinObs = 20

  def varEs(spark: SparkSession, dir: String): DataFrame = {
    val bars = closeBars5m(StockPipeline.normalize(Tables.events(spark, dir)))
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val prev = lag(col("close"), 1).over(w)
    val rets = bars
      .select(col("ticker"),
        when(prev =!= 0.0, col("close") / prev - 1).as("v"))
      .filter(col("v").isNotNull)
    val qs = Quantiles.exactPercentilesBy(rets, Seq("ticker"), Seq(VarLevel))
      .select(col("ticker"), round(element_at(col("bs"), 1), 6).as("var_5"))
    rets.join(broadcast(qs), Seq("ticker"))
      .groupBy(col("ticker"))
      .agg(count(lit(1)).as("n_rets"),
        max(col("var_5")).as("v5"),
        count(when(col("v") <= col("var_5"), 1)).as("n_tail"),
        (sum(when(col("v") <= col("var_5"), col("v"))
          .cast("decimal(38,18)")).cast("double") /
          count(when(col("v") <= col("var_5"), 1))).as("es_raw"))
      .select(col("ticker"), col("n_rets"),
        when(col("n_rets") >= VarMinObs, col("v5")).as("var_5"),
        when(col("n_rets") >= VarMinObs, col("n_tail")).as("n_tail"),
        when(col("n_rets") >= VarMinObs, round(col("es_raw"), 6))
          .as("es_5"))
      .orderBy(col("ticker"))
  }

  /** Rolling-correlation lookback, shared with the oracle generator. */
  val RollCorrSpan = 20

  /** Rolling pairwise return correlation: for each unordered ticker
    * pair, the Pearson correlation of the last [[RollCorrSpan]] JOINT
    * return observations at every bucket — the time-VARYING version of
    * [[corrPairs]] a pairs-trading stack actually monitors (a pair
    * whose correlation regime breaks is the trade signal). "Last 20"
    * counts joined observations (buckets where BOTH tickers traded),
    * the natural definition for return-sync analysis.
    *
    * Kernel discipline: five lag-chains (n, Σx, Σy, Σxy, Σx², Σy²)
    * over the pair-partitioned window — every term codegen'd, one
    * pinned summation order, oracle SQL generated from the same span —
    * then one closed-form corr per row with n>1 and positive-variance
    * guards. Pairs shuffle once on bucket (equi self-join) and once on
    * the pair key for the window — both bounded by pairs × span ×
    * buckets, never corpus-sized. */
  def rollingCorr(spark: SparkSession, dir: String): DataFrame =
    rollingCorrBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def rollingCorrBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val prev = lag(col("close"), 1).over(w)
    val rets = bars
      .select(col("ticker"), col("bucket"),
        when(prev =!= 0.0, col("close") / prev - 1).as("ret"))
      .filter(col("ret").isNotNull)
    val a = rets.select(col("ticker").as("ticker_a"), col("bucket"),
      col("ret").as("ret_a"))
    val b = rets.select(col("ticker").as("ticker_b"), col("bucket"),
      col("ret").as("ret_b"))
    val joined = a.join(b, Seq("bucket"))
      .filter(col("ticker_a") < col("ticker_b"))
    val pw = Window.partitionBy(col("ticker_a"), col("ticker_b"))
      .orderBy(col("bucket"))
    val terms = (0 until RollCorrSpan).map { i =>
      val x = lag(col("ret_a"), i).over(pw)
      val y = lag(col("ret_b"), i).over(pw)
      (when(x.isNotNull, lit(1L)).otherwise(lit(0L)),
        when(x.isNotNull, x).otherwise(lit(0.0)),
        when(y.isNotNull, y).otherwise(lit(0.0)),
        when(x.isNotNull, x * y).otherwise(lit(0.0)),
        when(x.isNotNull, x * x).otherwise(lit(0.0)),
        when(y.isNotNull, y * y).otherwise(lit(0.0)))
    }
    val n = terms.map(_._1).reduce(_ + _).cast("double")
    val sx = terms.map(_._2).reduce(_ + _)
    val sy = terms.map(_._3).reduce(_ + _)
    val sxy = terms.map(_._4).reduce(_ + _)
    val sxx = terms.map(_._5).reduce(_ + _)
    val syy = terms.map(_._6).reduce(_ + _)
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    joined
      .select(col("ticker_a"), col("ticker_b"), col("bucket"),
        n.cast("long").as("n_obs"),
        when(n > 1 && vx > 0.0 && vy > 0.0,
          round((n * sxy - sx * sy) / sqrt(vx * vy), 6)).as("roll_corr"))
      .orderBy(col("ticker_a"), col("ticker_b"), col("bucket"))
  }

  /** On-balance volume: the cumulative signed-volume flow indicator —
    * each bar adds its volume when the close rose, subtracts it when
    * it fell (first bar contributes nothing). The running total is a
    * plain window SUM OF LONGS: integer addition is associative, so
    * unlike the float kernels this is order-independent under any
    * engine's window-aggregation internals — no lag-chain needed. */
  def obv(spark: SparkSession, dir: String): DataFrame =
    obvBars(closeVolBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  /** 5-minute (close, volume) bars — [[closeBars5m]] plus the summed
    * volume the OBV flow needs. */
  private[graft] def closeVolBars5m(stock: DataFrame): DataFrame =
    stock
      .groupBy(col("ticker"),
        timestamp_seconds(expr("unix_timestamp(ts) div 300") * 300)
          .as("bucket"))
      .agg(max_by(col("price"), col("ts")).as("close"),
        sum(col("volume")).as("volume"))

  private[graft] def obvBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val cum = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val diff = col("close") - lag(col("close"), 1).over(w)
    bars
      .withColumn("flow",
        when(diff > 0, col("volume"))
          .when(diff < 0, -col("volume"))
          .otherwise(lit(0L)))
      .select(col("ticker"), col("bucket"), col("close"), col("volume"),
        sum(col("flow")).over(cum).as("obv"))
      .orderBy(col("ticker"), col("bucket"))
  }

  /** Volume-weighted average price per 5-minute bar — the execution-
    * quality benchmark price. Σ(price·volume) accumulates as
    * DECIMAL(28,10) (order-independent across any partitioning; the
    * per-row product is deterministic double math), volume as exact
    * longs; zero-volume bars yield NULL under the ANSI guard. */
  def vwap(spark: SparkSession, dir: String): DataFrame = {
    val stock = StockPipeline.normalize(Tables.events(spark, dir))
    stock
      .groupBy(col("ticker"),
        timestamp_seconds(expr("unix_timestamp(ts) div 300") * 300)
          .as("bucket"))
      .agg(
        sum((col("price") * col("volume")).cast("decimal(28,10)"))
          .cast("double").as("value"),
        sum(col("volume")).as("volume"))
      .select(col("ticker"), col("bucket"), col("volume"),
        when(col("volume") > 0, round(col("value") / col("volume"), 6))
          .as("vwap"))
      .orderBy(col("ticker"), col("bucket"))
  }

  /** Candlestick pattern flags over the 5-minute OHLC bars: doji
    * (body ≤ 10% of range; a zero-range bar counts as doji) and
    * bullish/bearish engulfing (direction flip with the previous bar's
    * body contained) — the rule-based signal layer a charting stack
    * derives from the reference's bars. Pure per-row comparisons plus
    * one lag window per ticker; every predicate is deterministic
    * double comparison stated identically by the oracle. */
  def candlePatterns(spark: SparkSession, dir: String): DataFrame =
    candlePatternsOn(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def candlePatternsOn(ohlc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val po = lag(col("open"), 1).over(w)
    val pc = lag(col("close"), 1).over(w)
    ohlc
      .select(col("ticker"), col("window_timestamp"),
        col("open"), col("high"), col("low"), col("close"),
        when(col("high") === col("low"), lit(true))
          .otherwise(abs(col("close") - col("open")) <=
            lit(0.1) * (col("high") - col("low"))).as("is_doji"),
        (pc.isNotNull && pc < po && col("close") > col("open") &&
          col("open") <= pc && col("close") >= po)
          .as("is_bullish_engulfing"),
        (pc.isNotNull && pc > po && col("close") < col("open") &&
          col("open") >= pc && col("close") <= po)
          .as("is_bearish_engulfing"))
      .orderBy(col("ticker"), col("window_timestamp"))
  }

  /** Intraday profile: per (ticker, hour-of-day), event count, exact
    * volume sum and decimal-exact VWAP — the time-of-day seasonality
    * surface (liquidity concentrates at session edges; execution
    * schedulers weight by exactly this curve). One hash aggregate on
    * the (ticker, hour) grain — 24 rows per symbol at any scale. */
  def intradayProfile(spark: SparkSession, dir: String): DataFrame = {
    val stock = StockPipeline.normalize(Tables.events(spark, dir))
    stock
      .groupBy(col("ticker"), hour(col("ts")).cast("long").as("hour_utc"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("volume")).as("total_volume"),
        sum((col("price") * col("volume")).cast("decimal(28,10)"))
          .cast("double").as("value"))
      .select(col("ticker"), col("hour_utc"), col("n_events"),
        col("total_volume"),
        when(col("total_volume") > 0,
          round(col("value") / col("total_volume"), 6)).as("vwap"))
      .orderBy(col("ticker"), col("hour_utc"))
  }

  /** Equal-volume bucket count for [[vpin]] — shared with the oracle
    * generator. */
  val VpinBuckets = 50L

  /** VPIN order-flow toxicity (volume-synchronized probability of
    * informed trading, Easley–López de Prado–O'Hara 2012) per ticker:
    * trades are tick-rule signed (price up vs previous trade → buy,
    * down → sell; a ZERO tick carries the previous trade's sign
    * forward — the full ELO tick rule — so only the leading run before
    * any price move stays unclassified, though it still fills
    * buckets), grouped into ~[[VpinBuckets]] equal-volume
    * buckets by exclusive cumulative volume, and VPIN is the
    * volume-weighted bucket imbalance Σ|V_buy−V_sell| / ΣV — the
    * flow-toxicity gauge that spiked ahead of the 2010 flash crash.
    *
    * Determinism: everything stays in exact integer space (long
    * volume cumsums, integer `div` bucketing, integer cell sums) until
    * the single final division, rounded to the 1e-6 grid; the trade
    * order is pinned by (ts, event_id).
    *
    * Scale: the sign AND the cumulative volume both come from
    * [[tickSides]] — the (ticker, day-bucket)-windowed classifier
    * whose carry summaries make it exact at any history length (the
    * round-12 plan audit flagged this operator's original
    * whole-history per-ticker window as the last instance of the
    * tickSides class; `TickRuleParitySpec` proves side and `cum_excl`
    * row-for-row against the single-window statement the oracle
    * keeps). Then a broadcast per-ticker volume-target table and two
    * hash aggregates whose grain is the bounded bucket grid
    * (#tickers × ~[[VpinBuckets]]) — no data-sized output. */
  def vpin(spark: SparkSession, dir: String): DataFrame = {
    val stock = StockPipeline.normalize(Tables.events(spark, dir))
    // side: the full ELO tick rule (zero ticks inherit the last
    // non-zero sign; rows before any price move stay NULL =
    // unclassified); cum_excl: exclusive running volume — both from
    // the one bucketed event-grain window pass
    val signed = tickSides(stock)
    val tot = stock.groupBy(col("ticker"))
      .agg(sum(col("volume")).as("tv"))
      .select(col("ticker"),
        greatest(expr(s"(tv + ${VpinBuckets - 1}) div $VpinBuckets"),
          lit(1L)).as("v_target"))
    val buckets = signed.join(broadcast(tot), Seq("ticker"))
      .select(col("ticker"), col("v_target"),
        expr("cum_excl div v_target").as("bucket"),
        col("side"), col("volume"))
      .groupBy(col("ticker"), col("v_target"), col("bucket"))
      .agg(
        sum(when(col("side") === 1, col("volume")).otherwise(lit(0L)))
          .as("v_buy"),
        sum(when(col("side") === -1, col("volume")).otherwise(lit(0L)))
          .as("v_sell"),
        sum(col("volume")).as("v_bucket"))
    buckets.groupBy(col("ticker"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("v_target")).as("v_target"),
        sum(abs(col("v_buy") - col("v_sell"))).as("imbalance"),
        sum(col("v_buy") + col("v_sell")).as("v_classified"),
        sum(col("v_bucket")).as("v_total"))
      .select(col("ticker"), col("n_buckets"), col("v_target"),
        col("imbalance"), col("v_classified"), col("v_total"),
        when(col("v_total") > 0,
          round(col("imbalance").cast("double") / col("v_total"), 6))
          .as("vpin"))
      .orderBy(col("ticker"))
  }

  /** Ljung–Box portmanteau test per ticker: Q = n(n+2)·Σ_{k=1..5}
    * ρ̂_k²/(n−k) over the 5-minute simple returns — the standard
    * "is there ANY autocorrelation in the first [[AcfLags]] lags?"
    * test a forecasting stack runs before believing a white-noise
    * residual claim. Unlike [[acf]] (per-lag Pearson corr over the
    * pair subset), ρ̂_k here is the textbook ACF estimator: lag-k
    * cross-deviations from the FULL-sample mean over the full-sample
    * variance — the estimator Q's asymptotic χ²(5) distribution
    * assumes.
    *
    * Determinism: all moment sums (global and per lag) accumulate on
    * the DECIMAL(38,18) grid (order-independent); the closed form is
    * named-column double algebra in one pinned order with the
    * NULL-guarded variance divisor; degenerate series yield NULL Q.
    *
    * Scale: ONE per-ticker window pass materializing the five lags,
    * then ONE hash aggregate to a row per ticker (map-side partial) —
    * no per-lag re-scan, nothing downstream is data-sized. */
  def ljungBox(spark: SparkSession, dir: String): DataFrame =
    ljungBoxBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def ljungBoxBars(bars: DataFrame): DataFrame = {
    val rets = simpleRets(bars, "r")
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val lagged = rets.select(
      Seq(col("ticker"), col("r")) ++
        AcfLags.map(k => lag(col("r"), k).over(w).as(s"rl$k")): _*)
    val aggCols = Seq(
      count(lit(1)).as("n"),
      dsum18(col("r")).as("sr"),
      dsum18(col("r") * col("r")).as("srr")) ++
      AcfLags.flatMap { k =>
        val rl = col(s"rl$k")
        Seq(count(rl).as(s"np$k"),
          dsum18(when(rl.isNotNull, col("r") * rl)).as(s"sxy$k"),
          dsum18(when(rl.isNotNull, col("r"))).as(s"sx$k"),
          dsum18(rl).as(s"sl$k"))
      }
    val sums = lagged.groupBy(col("ticker"))
      .agg(aggCols.head, aggCols.tail: _*)
    val nd = col("n").cast("double")
    val named = sums.select(
      Seq(col("ticker"), col("n"),
        (col("sr") / nd).as("rbar"),
        (col("srr") - col("sr") * col("sr") / nd).as("denom")) ++
        AcfLags.flatMap(k =>
          Seq(col(s"np$k"), col(s"sxy$k"), col(s"sx$k"), col(s"sl$k"))): _*)
    val rhos = named.select(
      Seq(col("ticker"), col("n")) ++
        AcfLags.map { k =>
          ((col(s"sxy$k") - col("rbar") * (col(s"sx$k") + col(s"sl$k")) +
            col(s"np$k").cast("double") * (col("rbar") * col("rbar"))) /
            when(col("denom") =!= 0.0, col("denom"))).as(s"rho$k")
        } ++ AcfLags.map(k => col(s"np$k")): _*)
    val q = col("n").cast("double") * (col("n") + 2).cast("double") *
      AcfLags.map { k =>
        when(col(s"np$k") > 0,
          col(s"rho$k") * col(s"rho$k") / col(s"np$k").cast("double"))
          .otherwise(lit(0.0))
      }.reduce(_ + _)
    rhos.select(
      Seq(col("ticker"), col("n").as("n_obs")) ++
        AcfLags.map(k => round(col(s"rho$k"), 6).as(s"rho_$k")) :+
        round(q, 6).as("q_lb"): _*)
      .orderBy(col("ticker"))
  }

  /** Two-sample Kolmogorov–Smirnov distance between every ticker
    * pair's 5-minute return distributions: D = sup|F_a − F_b|, the
    * distribution-free "do these two series move by the same law?"
    * test (KS sees shape differences correlation can't). EXACT
    * integer arithmetic throughout: per-pair per-distinct-value
    * (count_a, count_b) cells, running ECDF counts from one
    * partitioned window pass, and the sup as max|cum_a·n_b −
    * cum_b·n_a| — an integer numerator over the common denominator
    * n_a·n_b, divided once at the end. `ks_lambda` is the
    * √(n_a·n_b/(n_a+n_b))-scaled statistic used for asymptotic
    * p-values (λ > 1.36 ≈ reject at 5%).
    *
    * Scale: pair fan-out is #tickers−1 copies of each return row
    * (same quadratic-in-tickers shape as `stock_corr_pairs` — fine
    * for a dashboard's ticker universe; sample or bucket tickers
    * first if the universe is data-sized). Per-pair windows partition
    * by the pair key; everything else is hash aggregates. */
  def ksPairs(spark: SparkSession, dir: String): DataFrame =
    ksPairsBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def ksPairsBars(bars: DataFrame): DataFrame = {
    val rets = simpleRets(bars, "r")
    val tickers = rets.select(col("ticker")).distinct()
    val pairs = tickers.select(col("ticker").as("ticker_a"))
      .crossJoin(broadcast(tickers.select(col("ticker").as("ticker_b"))))
      .filter(col("ticker_a") < col("ticker_b"))
    val sideA = rets.select(col("ticker").as("ticker_a"), col("r"))
      .join(broadcast(pairs), Seq("ticker_a"))
      .select(col("ticker_a"), col("ticker_b"), col("r"),
        lit(1L).as("ca"), lit(0L).as("cb"))
    val sideB = rets.select(col("ticker").as("ticker_b"), col("r"))
      .join(broadcast(pairs), Seq("ticker_b"))
      .select(col("ticker_a"), col("ticker_b"), col("r"),
        lit(0L).as("ca"), lit(1L).as("cb"))
    val byVal = sideA.unionAll(sideB)
      .groupBy(col("ticker_a"), col("ticker_b"), col("r"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val w = Window.partitionBy(col("ticker_a"), col("ticker_b"))
      .orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byVal
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
    val tots = byVal.groupBy(col("ticker_a"), col("ticker_b"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val d = cum.join(broadcast(tots), Seq("ticker_a", "ticker_b"))
      .groupBy(col("ticker_a"), col("ticker_b"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
          .as("d_num"))
    val nad = col("n_a").cast("double"); val nbd = col("n_b").cast("double")
    val ksd = col("d_num").cast("double") / (nad * nbd)
    d.select(col("ticker_a"), col("ticker_b"), col("n_a"), col("n_b"),
        col("d_num"),
        round(ksd, 6).as("ks_d"),
        round(ksd * sqrt(nad * nbd / (nad + nbd)), 6).as("ks_lambda"))
      .orderBy(col("ticker_a"), col("ticker_b"))
  }

  /** Engle–Granger cointegration screen per ticker pair: OLS the
    * bucket-aligned close levels (y on x), then a no-constant
    * Dickey–Fuller regression of Δresidual on the lagged residual —
    * γ < 0 with a large-magnitude t says the spread mean-reverts
    * (the pairs-trading signal; t below ≈ −3.0 rejects a unit root).
    * Both regressions are one pass of DECIMAL(38,18)-grid moment sums
    * (the oracle crosses them VARCHAR-mediated — price-level sums sit
    * in the 1e5+ magnitude band); residuals are the pinned per-row
    * expression y − (α + β·x) with the fitted scalars broadcast back;
    * all divisors NULL-guarded.
    *
    * Scale: the pair alignment is a bucket equi-join; per-pair moment
    * aggregates are map-side partial; the only window is the per-pair
    * residual lag. Pair count is quadratic in tickers — the same
    * documented bound as `stock_corr_pairs`/`stock_ks_pairs`. */
  def cointegration(spark: SparkSession, dir: String): DataFrame =
    cointegrationBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def cointegrationBars(bars: DataFrame): DataFrame = {
    val a = bars.select(col("ticker").as("ticker_a"), col("bucket"),
      col("close").as("x"))
    val b = bars.select(col("ticker").as("ticker_b"), col("bucket"),
      col("close").as("y"))
    val joined = a.join(b, Seq("bucket"))
      .filter(col("ticker_a") < col("ticker_b"))
      .pin(eager = true)
    val nd1 = col("n_bars").cast("double")
    val fit = joined.groupBy(col("ticker_a"), col("ticker_b"))
      .agg(count(lit(1)).as("n_bars"),
        dsum18(col("x")).as("sx"), dsum18(col("y")).as("sy"),
        dsum18(col("x") * col("x")).as("sxx"),
        dsum18(col("x") * col("y")).as("sxy"))
      .select(col("ticker_a"), col("ticker_b"), col("n_bars"),
        col("sx"), col("sy"),
        ((col("sxy") - col("sx") * col("sy") / nd1) /
          when(col("sxx") - col("sx") * col("sx") / nd1 =!= 0.0,
            col("sxx") - col("sx") * col("sx") / nd1)).as("beta"))
      .select(col("ticker_a"), col("ticker_b"), col("n_bars"),
        col("beta"),
        ((col("sy") - col("beta") * col("sx")) / nd1).as("alpha"))
    val resid = joined
      .join(broadcast(fit), Seq("ticker_a", "ticker_b"))
      .select(col("ticker_a"), col("ticker_b"), col("bucket"),
        col("n_bars"), col("beta"), col("alpha"),
        (col("y") - (col("alpha") + col("beta") * col("x"))).as("e"))
    val lw = Window.partitionBy(col("ticker_a"), col("ticker_b"))
      .orderBy(col("bucket"))
    val steps = resid
      .select(col("ticker_a"), col("ticker_b"), col("n_bars"),
        col("beta"), col("alpha"), col("e"),
        lag(col("e"), 1).over(lw).as("el"))
      .filter(col("el").isNotNull)
      .select(col("ticker_a"), col("ticker_b"), col("n_bars"),
        col("beta"), col("alpha"), col("el"),
        (col("e") - col("el")).as("de"))
    val m2 = steps.groupBy(col("ticker_a"), col("ticker_b"))
      .agg(max(col("n_bars")).as("n_bars"),
        max(col("beta")).as("beta"), max(col("alpha")).as("alpha"),
        count(lit(1)).as("n_steps"),
        dsum18(col("el") * col("el")).as("see"),
        dsum18(col("el") * col("de")).as("sed"),
        dsum18(col("de") * col("de")).as("sdd"))
    val gamma = col("sed") / when(col("see") =!= 0.0, col("see"))
    val s2 = (col("sdd") - gamma * col("sed")) /
      (col("n_steps") - 1).cast("double")
    m2.select(col("ticker_a"), col("ticker_b"), col("n_bars"),
        round(col("beta"), 6).as("beta"),
        round(col("alpha"), 6).as("alpha"),
        round(gamma, 6).as("gamma"),
        round(gamma / when(s2 / col("see") > 0.0, sqrt(s2 / col("see"))),
          6).as("df_t"))
      .orderBy(col("ticker_a"), col("ticker_b"))
  }

  /** Durbin–Levinson level-k select expressions over the previous
    * level's `phi_{k-1}_j` columns and `rho1..rho5`: `phi_k_k` is the
    * PACF at lag k, the inner coefficients update as
    * φ_{k,j} = φ_{k−1,j} − φ_{k,k}·φ_{k−1,k−j}. The φ_{k,k} expression
    * is SUBSTITUTED (not alias-referenced) into the inner updates so
    * each level is one lateral-free select. Both engines evaluate
    * these strings verbatim — Spark via `selectExpr`, the oracle via
    * one generated CTE per level — so the double algebra is textually
    * pinned and cannot drift. */
  private def dlLevel(k: Int): Seq[(String, String)] =
    if (k == 1) Seq("phi_1_1" -> "rho1")
    else {
      val num = (1 until k)
        .map(j => s"phi_${k - 1}_$j * rho${k - j}").mkString(" + ")
      val den = (1 until k)
        .map(j => s"phi_${k - 1}_$j * rho$j").mkString(" + ")
      val kk = s"CASE WHEN 1.0 - ($den) <> 0.0" +
        s" THEN (rho$k - ($num)) / (1.0 - ($den)) END"
      (s"phi_${k}_$k" -> kk) +: (1 until k).map { j =>
        s"phi_${k}_$j" ->
          s"phi_${k - 1}_$j - ($kk) * phi_${k - 1}_${k - j}"
      }
    }

  /** The full PACF tail as shared select stages over the moment
    * columns `n_rets, s, p0, p{k}, a{k}, b{k}, n{k}` (k ∈ [[AcfLags]]):
    * first the double casts, then the global-mean autocovariances
    * c_k = p_k − μ(a_k + b_k) + n_k·μ², then ρ_k = c_k/c_0, then one
    * Durbin–Levinson level per lag. Each stage's expressions reference
    * only earlier-stage columns (lateral-free on both engines). */
  private[graft] val pacfStages: Seq[Seq[(String, String)]] = Seq(
    ("nd" -> "CAST(n_rets AS DOUBLE)") +:
      AcfLags.map(k => s"n${k}d" -> s"CAST(n$k AS DOUBLE)"),
    Seq("mu" -> "s / nd"),
    ("c0" -> "p0 - 2.0 * mu * s + nd * mu * mu") +:
      AcfLags.map(k =>
        s"c$k" -> s"p$k - mu * (a$k + b$k) + n${k}d * mu * mu"),
    AcfLags.map(k =>
      s"rho$k" -> s"c$k / (CASE WHEN c0 <> 0.0 THEN c0 END)")) ++
    AcfLags.map(dlLevel)

  /** Partial autocorrelation function per ticker at lags 1–5 over the
    * 5-minute simple returns: the Durbin–Levinson recursion on the
    * global-mean autocorrelations — φ_{k,k} is the lag-k correlation
    * AFTER regressing out lags 1..k−1, the AR-order-selection
    * companion to [[acf]] (an AR(p) series shows φ_{k,k} ≈ 0 beyond
    * p, while its raw ACF decays slowly). The lag products, marginal
    * sums and pair counts accumulate on the DECIMAL(38,18) grid in
    * ONE hash aggregate (one window pass builds all five lag
    * columns); every downstream double is a [[pacfStages]] expression
    * evaluated verbatim by both engines.
    *
    * Scale: one per-ticker lag window + one map-side-partial hash
    * aggregate to a row per ticker; the recursion is per-row algebra
    * on that metadata-sized frame. */
  def pacf(spark: SparkSession, dir: String): DataFrame =
    pacfBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def pacfBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val rets = simpleRets(bars, "r")
    val withLags = rets.select(
      col("ticker") +: col("r") +:
        AcfLags.map(k => lag(col("r"), k).over(w).as(s"rl$k")): _*)
    val m = withLags.groupBy(col("ticker")).agg(
      count(lit(1)).as("n_rets"),
      dsum18(col("r")).as("s") +: dsum18(col("r") * col("r")).as("p0") +:
        AcfLags.flatMap(k => Seq(
          dsum18(col("r") * col(s"rl$k")).as(s"p$k"),
          dsum18(when(col(s"rl$k").isNotNull, col("r"))).as(s"a$k"),
          dsum18(col(s"rl$k")).as(s"b$k"),
          count(col(s"rl$k")).as(s"n$k"))): _*)
    val solved = pacfStages.foldLeft(m) { (df, stage) =>
      df.selectExpr("*" +: stage.map { case (n, e) => s"($e) AS $n" }: _*)
    }
    AcfLags.map { k =>
      solved.select(col("ticker"), lit(k).cast("long").as("lag"),
        col(s"n$k").as("n_pairs"),
        expr(s"round(phi_${k}_$k, 6)").as("pacf"))
    }.reduce(_ unionAll _).orderBy(col("ticker"), col("lag"))
  }

  /** The order-3 ordinal-pattern classifier over columns `a, b, c`
    * (oldest → newest): a total, mutually exclusive CASE with ties
    * resolved by time order (the Bandt–Pompe stable-rank convention).
    * Shared verbatim by both engines — Spark via `expr`, the oracle
    * spliced — so tie handling cannot drift. */
  private[graft] val pePattern: String = """CASE
    WHEN a <= b AND b <= c THEN 0
    WHEN a <= c AND c < b THEN 1
    WHEN b < a AND a <= c THEN 2
    WHEN b <= c AND c < a THEN 3
    WHEN c < a AND a <= b THEN 4
    ELSE 5 END"""

  /** Permutation entropy (Bandt–Pompe, order 3) per ticker: classify
    * every 3-bar return window into one of 6 ordinal patterns and
    * report H = −Σ p·ln p over the pattern distribution, normalized
    * by ln 6 — the model-free complexity gauge (≈1: patterns
    * equiprobable / unpredictable; low: a few motifs dominate, the
    * series has exploitable structure). The pattern CASE is the
    * shared [[pePattern]] kernel; each −p·ln p term rides the
    * round-12/DECIMAL(28,12) grid so the ≤6-term sum is
    * order-independent; n and pattern counts stay BIGINT.
    *
    * Scale: one per-ticker lag window, a (ticker, pattern) hash
    * aggregate (≤ 6·tickers rows), one more to the ticker grain. */
  def permutationEntropy(spark: SparkSession, dir: String): DataFrame =
    permutationEntropyBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  /** ln 6 as a shared double constant — both engines parse the same
    * shortest-repr literal. */
  private[graft] val peLn6 = math.log(6.0)

  private[graft] def permutationEntropyBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val trip = simpleRets(bars, "c")
      .select(col("ticker"), col("c"),
        lag(col("c"), 1).over(w).as("b"),
        lag(col("c"), 2).over(w).as("a"))
      .filter(col("a").isNotNull)
    val counts = trip
      .select(col("ticker"), expr(pePattern).as("pattern"))
      .groupBy(col("ticker"), col("pattern"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy(col("ticker"))
      .agg(sum(col("cnt")).as("n_triples"))
    val p = col("cnt").cast("double") / col("n_triples").cast("double")
    counts.join(totals, Seq("ticker"))
      .select(col("ticker"), col("n_triples"),
        round(-(p * log(p)), 12).cast("decimal(28,12)").as("term"))
      .groupBy(col("ticker"))
      .agg(max(col("n_triples")).as("n_triples"),
        count(lit(1)).as("n_patterns"),
        sum(col("term")).cast("double").as("h"))
      .select(col("ticker"), col("n_triples"), col("n_patterns"),
        round(col("h"), 6).as("perm_entropy"),
        round(col("h") / lit(peLn6), 6).as("pe_norm"))
      .orderBy(col("ticker"))
  }

  /** Sortino and Omega ratios per ticker (zero target): downside
    * deviation √(Σ min(r,0)²/n) penalizes only harmful volatility —
    * the Sharpe correction for asymmetric return profiles — and
    * Ω = Σ gains / Σ losses is the full-distribution gain/loss odds
    * no moment statistic captures. Per-return min/max splits are
    * pinned per-row expressions; all four sums ride the
    * DECIMAL(38,18) grid; divisors NULL-guarded.
    *
    * Scale: one per-ticker lag window + one map-side-partial hash
    * aggregate — the [[rollSpread]] shape. */
  def sortino(spark: SparkSession, dir: String): DataFrame =
    sortinoBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def sortinoBars(bars: DataFrame): DataFrame = {
    val rets = simpleRets(bars, "r")
    val dn = least(col("r"), lit(0.0))
    val m = rets.groupBy(col("ticker")).agg(
      count(lit(1)).as("n_rets"),
      dsum18(col("r")).as("sr"),
      dsum18(dn * dn).as("sdd"),
      dsum18(greatest(col("r"), lit(0.0))).as("sgain"),
      dsum18(-least(col("r"), lit(0.0))).as("sloss"))
    val nd = col("n_rets").cast("double")
    val mean = col("sr") / nd
    val dd = sqrt(col("sdd") / nd)
    m.select(col("ticker"), col("n_rets"),
        round(mean, 6).as("mean_ret"),
        round(dd, 6).as("downside_dev"),
        round(mean / when(dd =!= 0.0, dd), 6).as("sortino"),
        round(col("sgain") / when(col("sloss") =!= 0.0, col("sloss")),
          6).as("omega"))
      .orderBy(col("ticker"))
  }

  /** Fractional-differencing order and window — shared with the
    * oracle. Weights follow w_0 = 1, w_k = −w_{k−1}·(d−k+1)/k,
    * computed once in Scala and interpolated as shortest-repr double
    * literals (the EWMA kernel discipline). */
  val FracD = 0.4
  val FracWindow = 12
  private[graft] val fracWeights: Seq[Double] = {
    val w = Array.fill(FracWindow)(1.0)
    for (k <- 1 until FracWindow)
      w(k) = -w(k - 1) * (FracD - k + 1) / k
    w.toSeq
  }

  /** Fractionally differentiated close series (López de Prado ch. 5,
    * fixed-width window): fd_t = Σ_k w_k·close_{t−k} with the binomial
    * weights of (1−B)^d at d = [[FracD]] — the minimal differencing
    * that makes a price series stationary while PRESERVING long-range
    * memory that full first-differencing (d=1) destroys; the standard
    * feature transform before fitting anything on levels. The weight
    * chain is generated from shared constants (both engines parse
    * bit-identical literals, summation in one textual order); rows
    * without the full [[FracWindow]]-bar history emit NULL, stated
    * identically by the oracle.
    *
    * Scale: one per-ticker lag window, then a stateless per-row
    * weighted sum — map-side after the partition sort. */
  def fracDiff(spark: SparkSession, dir: String): DataFrame =
    fracDiffBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def fracDiffBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val withLags = bars.select(
      col("ticker") +: col("bucket") +: col("close") +:
        (1 until FracWindow).map(k =>
          lag(col("close"), k).over(w).as(s"lg$k")): _*)
    val sum0 = fracWeights.zipWithIndex.map { case (wk, k) =>
      val c = if (k == 0) col("close") else col(s"lg$k")
      c * lit(wk)
    }.reduce(_ + _)
    withLags
      .select(col("ticker"), col("bucket"),
        when(col(s"lg${FracWindow - 1}").isNotNull,
          round(sum0, 6)).as("fracdiff"))
      .orderBy(col("ticker"), col("bucket"))
  }

  /** ln p / ln(1−p) for the [[VarLevel]] coverage — shared literals,
    * so neither engine's libm is in the loop for the constant part. */
  private[graft] val lnVarP = math.log(VarLevel)
  private[graft] val lnVar1P = math.log(1 - VarLevel)

  /** VaR backtest per ticker: Kupiec's proportion-of-failures LR (is
    * the violation RATE right) plus Christoffersen's independence LR
    * (do violations CLUSTER — the part a rate test can't see) against
    * the in-sample empirical 5% VaR, combined as LR_cc — the standard
    * regulatory model-validation pair (each χ²(1), cc χ²(2); > 3.84 /
    * 5.99 rejects). In-sample the POF statistic is near zero BY
    * CONSTRUCTION (the quantile sets the rate) — the clustering test
    * is the live one; a production desk feeds model VaR through the
    * same frame. Violation transition counts stay BIGINT; the
    * data-dependent logs ride the round-12 grid; the p-constants are
    * shared literals; every guard NULLs the statistic when a log
    * argument would be degenerate.
    *
    * Scale: the [[varEs]] quantile + one lag window + two per-ticker
    * hash aggregates. */
  def varBacktest(spark: SparkSession, dir: String): DataFrame = {
    val bars = closeBars5m(StockPipeline.normalize(Tables.events(spark, dir)))
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val rets = simpleRets(bars, "v")
    val qs = Quantiles
      .exactPercentilesBy(rets.select(col("ticker"), col("v")),
        Seq("ticker"), Seq(VarLevel))
      .select(col("ticker"), round(element_at(col("bs"), 1), 6).as("var_5"))
    val hits = rets.join(broadcast(qs), Seq("ticker"))
      .select(col("ticker"), col("bucket"),
        when(col("v") <= col("var_5"), 1L).otherwise(0L).as("hit"))
      .pin(eager = true)
    val tot = hits.groupBy(col("ticker"))
      .agg(count(lit(1)).as("n_rets"), sum(col("hit")).as("x"))
    val trans = hits
      .select(col("ticker"), col("hit"),
        lag(col("hit"), 1).over(w).as("ph"))
      .filter(col("ph").isNotNull)
      .groupBy(col("ticker"))
      .agg(sum(when(col("ph") === 0 && col("hit") === 0, 1L)
          .otherwise(0L)).as("n00"),
        sum(when(col("ph") === 0 && col("hit") === 1, 1L)
          .otherwise(0L)).as("n01"),
        sum(when(col("ph") === 1 && col("hit") === 0, 1L)
          .otherwise(0L)).as("n10"),
        sum(when(col("ph") === 1 && col("hit") === 1, 1L)
          .otherwise(0L)).as("n11"))
    val nd = col("n_rets").cast("double")
    val xd = col("x").cast("double")
    val xr = xd / nd
    // ln arguments NULL-guarded inline (DuckDB raises on ln(0) even
    // in unselected CASE branches — same discipline as divisions)
    val lrPof = lit(-2.0) * ((nd - xd) * lit(lnVar1P) + xd * lit(lnVarP) -
      (nd - xd) * round(log(when(lit(1.0) - xr > 0.0,
        lit(1.0) - xr)), 12) -
      xd * round(log(when(xr > 0.0, xr)), 12))
    val nt = (col("n00") + col("n01") + col("n10") + col("n11"))
      .cast("double")
    // 0·ln 0 = 0 convention: a zero transition cell contributes
    // nothing instead of NULLing the statistic (the textbook form)
    def t0(c: org.apache.spark.sql.Column,
        p: org.apache.spark.sql.Column) =
      when(c > 0, c.cast("double") *
          round(log(when(p > 0.0, p)), 12))
        .otherwise(lit(0.0))
    val pi01 = col("n01").cast("double") /
      when((col("n00") + col("n01")) > 0,
        (col("n00") + col("n01")).cast("double"))
    val pi11 = col("n11").cast("double") /
      when((col("n10") + col("n11")) > 0,
        (col("n10") + col("n11")).cast("double"))
    val pi = (col("n01") + col("n11")).cast("double") / nt
    val ll0 = t0(col("n00") + col("n10"), lit(1.0) - pi) +
      t0(col("n01") + col("n11"), pi)
    val llA = t0(col("n00"), lit(1.0) - pi01) +
      t0(col("n01"), pi01) +
      t0(col("n10"), lit(1.0) - pi11) +
      t0(col("n11"), pi11)
    val lrInd = lit(-2.0) * (ll0 - llA)
    tot.join(trans, Seq("ticker"))
      .select(col("ticker"), col("n_rets"), col("x").as("n_viol"),
        col("n01"), col("n11"),
        when(col("x") > 0 && col("x") < col("n_rets"),
          round(lrPof, 6)).as("lr_pof"),
        round(lrInd, 6).as("lr_ind"),
        when(col("x") > 0 && col("x") < col("n_rets"),
          round(lrPof + lrInd, 6)).as("lr_cc"))
      .orderBy(col("ticker"))
  }

  /** Ichimoku spans (bars) — shared with the oracle. */
  val IchiTenkan = 9
  val IchiKijun = 26
  val IchiSenkouB = 52

  /** Ichimoku cloud over the 5-minute close bars (close-based
    * variant): tenkan/kijun/senkou-B midlines are rolling
    * (max+min)/2 over [[IchiTenkan]]/[[IchiKijun]]/[[IchiSenkouB]]
    * bars; senkou A/B are their values [[IchiKijun]] bars AGO (the
    * cloud is plotted forward, so the value valid NOW was computed 26
    * bars back); chikou is the close 26 bars AHEAD. Warm-up bars
    * carry partial-window midlines (min/max over what exists) —
    * stated identically by the oracle. Pure per-ticker ROWS-frame
    * windows: one sort, no shuffle beyond the ticker partition.
    *
    * Scale: bounded-frame window aggregates — Spark evaluates a
    * sliding min/max frame incrementally; nothing is data-sized per
    * row. */
  def ichimoku(spark: SparkSession, dir: String): DataFrame =
    ichimokuBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def ichimokuBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    def mid(n: Int) = {
      val f = w.rowsBetween(-(n - 1), 0)
      (max(col("close")).over(f) + min(col("close")).over(f)) / 2.0
    }
    bars
      .select(col("ticker"), col("bucket"), col("close"),
        mid(IchiTenkan).as("tenkan0"), mid(IchiKijun).as("kijun0"),
        mid(IchiSenkouB).as("senkou_b0"))
      .select(col("ticker"), col("bucket"),
        round(col("tenkan0"), 6).as("tenkan"),
        round(col("kijun0"), 6).as("kijun"),
        round(lag((col("tenkan0") + col("kijun0")) / 2.0, IchiKijun)
          .over(w), 6).as("senkou_a"),
        round(lag(col("senkou_b0"), IchiKijun).over(w), 6)
          .as("senkou_b"),
        lead(col("close"), IchiKijun).over(w).as("chikou"))
      .orderBy(col("ticker"), col("bucket"))
  }

  /** Minimum-variance two-asset weights per ticker pair: from the
    * bucket-aligned 5-minute returns, w_a = (σ_b² − σ_ab) /
    * (σ_a² + σ_b² − 2σ_ab) — the closed-form Markowitz frontier
    * endpoint — plus the achieved portfolio variance and the variance
    * reduction vs the better single asset (the hedging-value number a
    * pairs desk actually reads). Moment sums ride the DECIMAL(38,18)
    * grid; all variance/weight algebra is pinned double with
    * NULL-guarded denominators; w is NOT clamped to [0,1] (a negative
    * weight is a short — information, not an error).
    *
    * Scale: the [[corrPairs]] shape — bucket equi-join +
    * map-side-partial per-pair aggregates; quadratic in tickers
    * (documented bound). */
  def minVarPairs(spark: SparkSession, dir: String): DataFrame =
    minVarPairsBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def minVarPairsBars(bars: DataFrame): DataFrame = {
    val rets = simpleRets(bars, "r")
    val a = rets.select(col("ticker").as("ticker_a"), col("bucket"),
      col("r").as("x"))
    val b = rets.select(col("ticker").as("ticker_b"), col("bucket"),
      col("r").as("y"))
    val m = a.join(b, Seq("bucket"))
      .filter(col("ticker_a") < col("ticker_b"))
      .groupBy(col("ticker_a"), col("ticker_b"))
      .agg(count(lit(1)).as("n_steps"),
        dsum18(col("x")).as("sx"), dsum18(col("y")).as("sy"),
        dsum18(col("x") * col("x")).as("sxx"),
        dsum18(col("y") * col("y")).as("syy"),
        dsum18(col("x") * col("y")).as("sxy"))
    val nd = col("n_steps").cast("double")
    val va = col("sxx") / nd - (col("sx") / nd) * (col("sx") / nd)
    val vb = col("syy") / nd - (col("sy") / nd) * (col("sy") / nd)
    val cab = col("sxy") / nd - (col("sx") / nd) * (col("sy") / nd)
    val den = va + vb - lit(2.0) * cab
    val w = (vb - cab) / when(den =!= 0.0, den)
    val vmin = va * w * w + vb * (lit(1.0) - w) * (lit(1.0) - w) +
      lit(2.0) * cab * w * (lit(1.0) - w)
    m.select(col("ticker_a"), col("ticker_b"), col("n_steps"),
        round(w, 6).as("w_a"),
        round(vmin, 6).as("var_min"),
        round(lit(1.0) - vmin / when(least(va, vb) =!= 0.0,
          least(va, vb)), 6).as("var_reduction"))
      .orderBy(col("ticker_a"), col("ticker_b"))
  }

  /** Triple-barrier parameters — shared with the oracle. The synthetic
    * feed's 5-minute bars swing whole multiples (prices are draws, not
    * a walk), so the barriers sit at +400%/−90% to make all three
    * outcomes live: 476/126/325 dn/time/up at sf0.001, 4357/1395/3141
    * at sf0.01. A real equity feed would run ±2%. */
  val TbUp = 5.0
  val TbDn = -0.9
  val TbHorizon = 12

  /** First-touch kernel over columns `rr1..rrH` (forward returns at
    * +1..+H bars): three CASE chains scanning k ascending — at the
    * same bar the UP barrier wins (deterministic tie rule). Shared
    * verbatim by both engines. */
  private[graft] val tbKernels: Seq[(String, String)] = {
    val (up, dn, h) = (TbUp, TbDn, TbHorizon)
    val label = (1 to h).map(k =>
      s"WHEN rr$k >= $up THEN 1 WHEN rr$k <= $dn THEN -1")
      .mkString("CASE ", " ", " ELSE 0 END")
    val tHit = (1 to h).map(k =>
      s"WHEN rr$k >= $up OR rr$k <= $dn THEN $k")
      .mkString("CASE ", " ", s" ELSE $h END")
    val hitRet = (1 to h).map(k =>
      s"WHEN rr$k >= $up OR rr$k <= $dn THEN rr$k")
      .mkString("CASE ", " ", s" ELSE rr$h END")
    Seq("label" -> label, "t_hit" -> tHit, "hit_ret" -> hitRet)
  }

  /** Triple-barrier labels (López de Prado) per bar: within the next
    * [[TbHorizon]] bars, which barrier is touched FIRST — profit-take
    * at +[[TbUp]] (label 1), stop at [[TbDn]] (−1), or the time
    * barrier (0 with the horizon return) — the standard label
    * generator for financial ML training sets (fixed-horizon returns
    * leak the path; first-touch doesn't). Forward returns come from a
    * generated lead chain on the per-ticker window; the three
    * first-touch CASE scans are the shared [[tbKernels]] strings, so
    * tie handling (up wins at the same bar) cannot drift. Bars whose
    * full horizon runs past the series end are dropped (no
    * partial-window bias), stated identically by the oracle.
    *
    * Scale: one per-ticker window pass building H lead columns, then
    * stateless per-row kernels — map-side after the window sort. */
  def tripleBarrier(spark: SparkSession, dir: String): DataFrame =
    tripleBarrierBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def tripleBarrierBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val h = TbHorizon
    val withLeads = bars.select(
      col("ticker") +: col("bucket") +: col("close") +:
        (1 to h).map(k => lead(col("close"), k).over(w).as(s"ld$k")): _*)
    val withRr = withLeads
      .filter(col(s"ld$h").isNotNull)
      .select(col("ticker") +: col("bucket") +:
        (1 to h).map(k => (col(s"ld$k") /
          when(col("close") =!= 0.0, col("close")) - 1.0).as(s"rr$k")): _*)
    withRr.select(
        col("ticker") +: col("bucket") +:
          tbKernels.map { case (n, e) =>
            (if (n == "hit_ret") round(expr(e), 6) else expr(e)).as(n)
          }: _*)
      .orderBy(col("ticker"), col("bucket"))
  }

  /** Candidate periods (in 5-minute bars) for [[spectralEntropy]] —
    * shared with the oracle. */
  val SpecPeriods = Seq(2, 3, 4, 6, 8, 12, 24)
  private[graft] val seLnP = math.log(SpecPeriods.length.toDouble)

  /** Spectral entropy per ticker: Goertzel-style DFT power of the
    * centered 5-minute returns at the fixed [[SpecPeriods]] grid,
    * powers normalized to shares, H = −Σ s·ln s over the shares
    * (normalized by ln |P|) plus the argmax period — the
    * frequency-domain complexity gauge pairing with
    * [[permutationEntropy]] (flat spectrum ≈ 1: white noise; low: one
    * cycle dominates, the intraday periodicity signal). Per-period
    * cos/sin products ride the round-10/DECIMAL(28,10) grid (the
    * seasonality-DFT convention); entropy terms the round-12 grid.
    *
    * Scale: one per-ticker lag window + |P| hash aggregates over one
    * pinned centered-return frame; everything downstream is
    * (tickers × |P|)-row algebra. */
  def spectralEntropy(spark: SparkSession, dir: String): DataFrame =
    spectralEntropyBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def spectralEntropyBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val rets = simpleRets(bars, "r")
      .select(col("ticker"), col("r"),
        (row_number().over(w) - 1).cast("long").as("t"))
    val means = rets.groupBy(col("ticker"))
      .agg(count(lit(1)).as("n_rets"), dsum18(col("r")).as("sr"))
    val based = rets.join(broadcast(means), Seq("ticker"))
      .select(col("ticker"), col("n_rets"), col("t"),
        (col("r") - col("sr") / col("n_rets").cast("double")).as("xc"))
      // feeds one aggregate per candidate period
      .pin(eager = true)
    val twoPi = 2 * math.Pi
    val perP = SpecPeriods.map { p =>
      val ang = lit(twoPi) * (col("t") % p).cast("double") /
        lit(p.toDouble)
      based.select(col("ticker"), col("n_rets"),
          round(col("xc") * cos(ang), 10).cast("decimal(28,10)")
            .as("ca"),
          round(col("xc") * sin(ang), 10).cast("decimal(28,10)")
            .as("cb"))
        .groupBy(col("ticker"))
        .agg(max(col("n_rets")).as("n_rets"),
          sum(col("ca")).cast("double").as("a"),
          sum(col("cb")).cast("double").as("b"))
        .select(col("ticker"), col("n_rets"),
          lit(p).cast("long").as("period"),
          (col("a") * col("a") + col("b") * col("b")).as("power"))
    }
    val powers = perP.reduce(_ unionAll _)
    val tot = powers.groupBy(col("ticker"))
      .agg(sum(round(col("power"), 10).cast("decimal(28,10)"))
        .cast("double").as("ptot"))
    val shares = powers.join(broadcast(tot), Seq("ticker"))
      .select(col("ticker"), col("n_rets"), col("period"),
        (col("power") / when(col("ptot") > 0.0, col("ptot"))).as("s"))
    val ent = shares
      .select(col("ticker"), col("n_rets"),
        coalesce(when(col("s") > 0.0,
            round(-(col("s") * log(col("s"))), 12)),
          lit(0.0)).cast("decimal(28,12)").as("term"))
      .groupBy(col("ticker"))
      .agg(max(col("n_rets")).as("n_rets"),
        sum(col("term")).cast("double").as("h"))
    val wp = Window.partitionBy(col("ticker"))
      .orderBy(col("s").desc, col("period"))
    val pk = shares.withColumn("rn", row_number().over(wp))
      .filter(col("rn") === 1)
      .select(col("ticker"), col("period").as("peak_period"),
        round(col("s"), 6).as("peak_share"))
    ent.join(pk, Seq("ticker"))
      .select(col("ticker"), col("n_rets"),
        round(col("h"), 6).as("spec_entropy"),
        round(col("h") / lit(seLnP), 6).as("se_norm"),
        col("peak_period"), col("peak_share"))
      .orderBy(col("ticker"))
  }

  /** Granger-causality screen over ordered ticker pairs (cause →
    * effect): regress the effect's 5-minute return on its own lag and
    * the cause's lag, and F-test the cross term against the
    * restricted own-lag-only model — F = (RSS_r − RSS_u)/(RSS_u/(n−3))
    * with 1 numerator df (large F: the cause's past improves the
    * effect's one-step forecast, the lead-lag signal [[leadLag]]
    * correlates but never tests). Return alignment is a bucket
    * equi-join; the nine moment sums accumulate on the
    * DECIMAL(38,18) grid in one per-pair hash aggregate; the 2×2
    * normal-equation solve, both RSS forms and F are pinned double
    * algebra with NULL-guarded determinant/variance divisors.
    *
    * Scale: same shape as [[cointegrationBars]] — bucket equi-join,
    * map-side-partial aggregates, one per-pair lag window; ordered
    * pair count is quadratic in tickers (documented bound). */
  def granger(spark: SparkSession, dir: String): DataFrame =
    grangerBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def grangerBars(bars: DataFrame): DataFrame = {
    val rets = simpleRets(bars, "r")
    val c = rets.select(col("ticker").as("cause"), col("bucket"),
      col("r").as("rc"))
    val e = rets.select(col("ticker").as("effect"), col("bucket"),
      col("r").as("re"))
    val aligned = c.join(e, Seq("bucket"))
      .filter(col("cause") =!= col("effect"))
    val w = Window.partitionBy(col("cause"), col("effect"))
      .orderBy(col("bucket"))
    val lagged = aligned
      .select(col("cause"), col("effect"),
        col("re").as("y"),
        lag(col("re"), 1).over(w).as("x1"),
        lag(col("rc"), 1).over(w).as("x2"))
      .filter(col("x1").isNotNull && col("x2").isNotNull)
    val m = lagged.groupBy(col("cause"), col("effect")).agg(
      count(lit(1)).as("n_steps"),
      dsum18(col("x1")).as("sx1"), dsum18(col("x2")).as("sx2"),
      dsum18(col("y")).as("sy"),
      dsum18(col("x1") * col("x1")).as("sx1x1"),
      dsum18(col("x1") * col("x2")).as("sx1x2"),
      dsum18(col("x2") * col("x2")).as("sx2x2"),
      dsum18(col("x1") * col("y")).as("sx1y"),
      dsum18(col("x2") * col("y")).as("sx2y"),
      dsum18(col("y") * col("y")).as("syy"))
    val nd = col("n_steps").cast("double")
    val cen = m.select(col("cause"), col("effect"), col("n_steps"),
      (col("sx1x1") - col("sx1") * col("sx1") / nd).as("s11"),
      (col("sx1x2") - col("sx1") * col("sx2") / nd).as("s12"),
      (col("sx2x2") - col("sx2") * col("sx2") / nd).as("s22"),
      (col("sx1y") - col("sx1") * col("sy") / nd).as("s1y"),
      (col("sx2y") - col("sx2") * col("sy") / nd).as("s2y"),
      (col("syy") - col("sy") * col("sy") / nd).as("syy_c"))
    // n_steps > 2 is the rank condition: with two aligned steps the
    // centered 2-regressor system is singular by construction and det
    // is pure float noise — the NULL guard must fire on the MATH, not
    // on the noisy det value (which differs sub-ulp across engines)
    val det = col("s11") * col("s22") - col("s12") * col("s12")
    val detG = when(col("n_steps") > 2 && det =!= 0.0, det)
    val sol = cen.select(col("cause"), col("effect"), col("n_steps"),
      col("s1y"), col("s2y"), col("syy_c"), col("s11"),
      ((col("s1y") * col("s22") - col("s2y") * col("s12")) / detG)
        .as("b1"),
      ((col("s2y") * col("s11") - col("s1y") * col("s12")) / detG)
        .as("b2"))
    val rssU = col("syy_c") - col("b1") * col("s1y") -
      col("b2") * col("s2y")
    val rssR = col("syy_c") -
      col("s1y") * col("s1y") / when(col("s11") =!= 0.0, col("s11"))
    sol.select(col("cause"), col("effect"), col("n_steps"),
        round(col("b2"), 6).as("beta_cross"),
        round(when(col("n_steps") > 3,
            (rssR - rssU) /
              (when(rssU =!= 0.0, rssU) /
                (col("n_steps") - 3).cast("double"))), 6).as("f_stat"))
      .orderBy(col("cause"), col("effect"))
  }

  /** Engle's ARCH(1) LM test per ticker: regress squared returns on
    * their own lag and report LM = n·R² — the standard "does
    * volatility cluster?" screen run before fitting any GARCH model
    * (χ²(1) under the no-ARCH null; LM > 3.84 rejects at 5%). Squared
    * returns are identically-computed doubles on both engines; the
    * five moment sums accumulate on the DECIMAL(38,18) grid (order-
    * independent), and slope/R²/LM are pinned double algebra with
    * NULL-guarded variance divisors.
    *
    * Scale: one per-ticker lag window pass + one hash aggregate to a
    * row per ticker — the same shape as [[rollSpread]]. */
  def archLm(spark: SparkSession, dir: String): DataFrame =
    archLmBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def archLmBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val sq = simpleRets(bars, "r")
      .select(col("ticker"), col("bucket"), (col("r") * col("r")).as("y"))
    val pairs = sq
      .select(col("ticker"), col("y"), lag(col("y"), 1).over(w).as("x"))
      .filter(col("x").isNotNull)
    val m = pairs.groupBy(col("ticker")).agg(
      count(lit(1)).as("n_pairs"),
      dsum18(col("x")).as("sx"), dsum18(col("y")).as("sy"),
      dsum18(col("x") * col("x")).as("sxx"),
      dsum18(col("y") * col("y")).as("syy"),
      dsum18(col("x") * col("y")).as("sxy"))
    val nd = col("n_pairs").cast("double")
    val num = col("sxy") - col("sx") * col("sy") / nd
    val vx = col("sxx") - col("sx") * col("sx") / nd
    val vy = col("syy") - col("sy") * col("sy") / nd
    val r2 = (num * num) / when(vx * vy =!= 0.0, vx * vy)
    m.select(col("ticker"), col("n_pairs"),
        round(num / when(vx =!= 0.0, vx), 6).as("arch_slope"),
        round(r2, 6).as("r2"),
        round(nd * r2, 6).as("lm_stat"))
      .orderBy(col("ticker"))
  }

  /** Wald–Wolfowitz runs test per ticker: are the SIGNS of the
    * 5-minute returns randomly ordered, or do up/down moves cluster
    * (momentum) or alternate (mean reversion)? Zero returns are
    * dropped; a run is a maximal block of equal signs, counted as
    * 1 + Σ[sign ≠ previous sign] in one per-ticker window pass. With
    * n⁺ pluses and n⁻ minuses, E[R] = 2n⁺n⁻/n + 1 and
    * Var[R] = 2n⁺n⁻(2n⁺n⁻−n)/(n²(n−1)); z = (R−E[R])/√Var — |z| > 2
    * flags non-randomness. Counts are exact integers; the closed form
    * is pinned double algebra with a NULL-guarded variance root.
    *
    * Scale: one partitioned window pass + one per-ticker hash
    * aggregate — map-side partial, output is one row per ticker. */
  def runsTest(spark: SparkSession, dir: String): DataFrame =
    runsTestBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def runsTestBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val sgns = simpleRets(bars, "r")
      .select(col("ticker"), col("bucket"), signum(col("r")).as("sgn"))
      .filter(col("sgn") =!= 0.0)
    val flagged = sgns
      .withColumn("chg",
        when(lag(col("sgn"), 1).over(w).isNull ||
          col("sgn") =!= lag(col("sgn"), 1).over(w), 1L).otherwise(0L))
    val m = flagged.groupBy(col("ticker")).agg(
      count(lit(1)).as("n_obs"),
      sum(when(col("sgn") === 1.0, 1L).otherwise(0L)).as("n_plus"),
      sum(when(col("sgn") === -1.0, 1L).otherwise(0L)).as("n_minus"),
      sum(col("chg")).as("n_runs"))
    val nd = col("n_obs").cast("double")
    val a = lit(2.0) * col("n_plus").cast("double") *
      col("n_minus").cast("double")
    val mu = a / nd + 1.0
    val variance = a * (a - nd) / (nd * nd * (nd - 1.0))
    m.select(col("ticker"), col("n_obs"), col("n_plus"),
        col("n_minus"), col("n_runs"),
        round(mu, 6).as("expected_runs"),
        round((col("n_runs").cast("double") - mu) /
          when(variance > 0.0, sqrt(variance)), 6).as("z_score"))
      .orderBy(col("ticker"))
  }

  /** MACD spans (fast/slow/signal), shared with the oracle generator. */
  val MacdFast = 12
  val MacdSlow = 26
  val MacdSignal = 9

  /** Truncated-EWMA kernel over `c`: the [[ewmaBars]] lag-chain
    * generalized to any span/column — num = Σ_i (1-α)^i·x_{t-i},
    * den = Σ_i over the non-null lags, summation order = textual order
    * of the `+` chain (pinned identically in the generated oracle). */
  private def ewmaKernel(c: org.apache.spark.sql.Column, span: Int,
      w: org.apache.spark.sql.expressions.WindowSpec)
      : org.apache.spark.sql.Column = {
    val alpha = 2.0 / (span + 1)
    val terms = (0 until span).map { i =>
      val weight = math.pow(1.0 - alpha, i)
      val x = lag(c, i).over(w)
      (when(x.isNotNull, x * lit(weight)).otherwise(lit(0.0)),
        when(x.isNotNull, lit(weight)).otherwise(lit(0.0)))
    }
    terms.map(_._1).reduce(_ + _) / terms.map(_._2).reduce(_ + _)
  }

  /** MACD over the 5-minute close bars: fast([[MacdFast]]) − slow
    * ([[MacdSlow]]) truncated EWMAs of the close, a [[MacdSignal]]-span
    * EWMA of the (unrounded) MACD line as the signal, histogram =
    * macd − signal. Two window passes per ticker — the second chain
    * lags the computed macd column, so the plan is still two codegen'd
    * window stages over the same (ticker, bucket) sort; no extra
    * shuffle (same partitioning reused). Leading-edge bars carry the
    * renormalized partial kernels (the [[ewmaBars]] convention). */
  def macd(spark: SparkSession, dir: String): DataFrame =
    macdBars(closeBars5m(StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def macdBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val line = ewmaKernel(col("close"), MacdFast, w) -
      ewmaKernel(col("close"), MacdSlow, w)
    val sig = ewmaKernel(col("macd_raw"), MacdSignal, w)
    // Signed-zero guard: the fast−slow / macd−signal subtractions can
    // land on ±ε that the engines' round implementations collapse to
    // zeros of OPPOSITE sign (Spark rounds through unsigned BigDecimal
    // → +0.0; a float-multiply round keeps the sign → −0.0). The CASE
    // maps both to +0.0 — stated identically by the oracle — and
    // survives constant folding, unlike `+ 0.0`.
    def z(c: org.apache.spark.sql.Column) =
      when(c === lit(0.0), lit(0.0)).otherwise(c)
    bars
      .withColumn("macd_raw", line)
      .select(col("ticker"), col("bucket"), col("close"),
        z(round(col("macd_raw"), 6)).as("macd"),
        z(round(sig, 6)).as("macd_signal"),
        z(round(col("macd_raw") - sig, 6)).as("macd_hist"))
      .orderBy(col("ticker"), col("bucket"))
  }

  /** Stochastic-oscillator lookbacks, shared with the oracle generator. */
  val StochSpan = 14
  val StochSmooth = 3

  /** Stochastic oscillator over the 5-minute OHLC bars: %K = 100·
    * (close − lowest low)/(highest high − lowest low) over the trailing
    * [[StochSpan]] bars, %D = [[StochSmooth]]-bar mean of %K. The
    * trailing extrema are plain window min/max (exact comparisons —
    * order-independent under any engine's window internals, unlike
    * float sums), so only the tiny %D smoothing needs the pinned
    * lag-chain. Flat windows (high == low throughout) yield NULL %K;
    * %D averages the non-null %K values in its window. */
  def stochastic(spark: SparkSession, dir: String): DataFrame =
    stochasticOhlc(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def stochasticOhlc(ohlc: DataFrame): DataFrame = {
    val tw = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val span = tw.rowsBetween(-(StochSpan - 1), Window.currentRow)
    val ll = min(col("low")).over(span)
    val hh = max(col("high")).over(span)
    val withK = ohlc
      .select(col("ticker"), col("window_timestamp"), col("close"),
        when(hh =!= ll,
          lit(100.0) * (col("close") - ll) / (hh - ll)).as("k_raw"))
    val terms = (0 until StochSmooth).map { i =>
      val x = lag(col("k_raw"), i).over(tw)
      (when(x.isNotNull, x).otherwise(lit(0.0)),
        when(x.isNotNull, lit(1L)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    withK
      .select(col("ticker"), col("window_timestamp"),
        round(col("k_raw"), 6).as("pct_k"),
        when(den > 0, round(num / den, 6)).as("pct_d"))
      .orderBy(col("ticker"), col("window_timestamp"))
  }

  /** ATR lookback, shared with the oracle generator. */
  val AtrSpan = 14

  /** Average True Range over the 5-minute OHLC bars: true range =
    * max(high−low, |high−prev close|, |low−prev close|) — the gap-
    * aware volatility measure — smoothed by a [[AtrSpan]]-bar trailing
    * mean (lag-chain, pinned order; the leading edge renormalizes like
    * every kernel in this file). First bar has no previous close: its
    * TR is the plain high−low range, the standard convention. */
  def atr(spark: SparkSession, dir: String): DataFrame =
    atrOhlc(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def atrOhlc(ohlc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val pc = lag(col("close"), 1).over(w)
    val tr = when(pc.isNull, col("high") - col("low"))
      .otherwise(greatest(col("high") - col("low"),
        abs(col("high") - pc), abs(col("low") - pc)))
    val withTr = ohlc.select(col("ticker"), col("window_timestamp"),
      col("close"), tr.as("tr"))
    val terms = (0 until AtrSpan).map { i =>
      val x = lag(col("tr"), i).over(w)
      (when(x.isNotNull, x).otherwise(lit(0.0)),
        when(x.isNotNull, lit(1L)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    withTr
      .select(col("ticker"), col("window_timestamp"),
        round(col("tr"), 6).as("tr"),
        round(num / den, 6).as("atr_14"))
      .orderBy(col("ticker"), col("window_timestamp"))
  }

  /** Donchian lookback, shared with the oracle generator. */
  val DonchianSpan = 20

  /** Donchian channel over the 5-minute OHLC bars: trailing
    * [[DonchianSpan]]-bar highest high / lowest low and their
    * midpoint — the breakout-system channel (Turtle rules). NO float
    * summation anywhere: the channel is pure max/min over exact bar
    * prices (both engines' `greatest`/`least` skip NULLs — spec- and
    * probe-verified), so the kernel is bit-exact by construction; the
    * midpoint is one identical (up+dn)/2 per row. The leading edge
    * needs no special case — lag 0 is the current bar, so the chain
    * is never all-NULL. */
  def donchian(spark: SparkSession, dir: String): DataFrame =
    donchianOhlc(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def donchianOhlc(ohlc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val up = greatest((0 until DonchianSpan)
      .map(i => lag(col("high"), i).over(w)): _*)
    val dn = least((0 until DonchianSpan)
      .map(i => lag(col("low"), i).over(w)): _*)
    ohlc.select(col("ticker"), col("window_timestamp"), col("close"),
        up.as("dcu"), dn.as("dcd"))
      .select(col("ticker"), col("window_timestamp"), col("close"),
        round(col("dcu"), 6).as("dc_up"),
        round(col("dcd"), 6).as("dc_dn"),
        round((col("dcu") + col("dcd")) / 2.0, 6).as("dc_mid"))
      .orderBy(col("ticker"), col("window_timestamp"))
  }

  /** ADX lookback, shared with the oracle generator. */
  val AdxSpan = 14

  /** Average Directional Index over the 5-minute OHLC bars: Wilder's
    * trend-strength system as truncated lag-chains — per bar the
    * directional movements (+DM = up-move when it beats the down-move
    * and is positive, −DM symmetric) and the true range; trailing
    * [[AdxSpan]]-bar sums give +DI/−DI = 100·ΣDM/ΣTR, the DX spread
    * 100·|+DI−−DI|/(+DI+−DI), and ADX as the trailing mean of DX —
    * a SECOND-level lag-chain over the first chain's output, the
    * deepest composition in the indicator family.
    *
    * Determinism: every sum is a pinned-textual-order lag-chain
    * (identical fp order on both engines — no decimal grid needed);
    * first-bar rows carry NULL DM/TR and contribute the same
    * literal 0.0 as out-of-range lags; all three ratio tiers use the
    * NULL-divisor guard (zero ΣTR → NULL DI, zero DI sum → NULL DX,
    * no DX yet → NULL ADX), stated identically by the oracle. */
  def adx(spark: SparkSession, dir: String): DataFrame =
    adxOhlc(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def adxOhlc(ohlc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val ph = lag(col("high"), 1).over(w)
    val pl = lag(col("low"), 1).over(w)
    val pc = lag(col("close"), 1).over(w)
    val up = col("high") - ph
    val dn = pl - col("low")
    val base = ohlc.select(col("ticker"), col("window_timestamp"),
      when(ph.isNotNull,
        when(up > dn && up > 0.0, up).otherwise(lit(0.0))).as("dmp"),
      when(ph.isNotNull,
        when(dn > up && dn > 0.0, dn).otherwise(lit(0.0))).as("dmm"),
      when(pc.isNotNull,
        greatest(col("high") - col("low"), abs(col("high") - pc),
          abs(col("low") - pc))).as("tr"))
    val w2 = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    def chain(c: String): org.apache.spark.sql.Column =
      (0 until AdxSpan).map { i =>
      val x = lag(col(c), i).over(w2)
      when(x.isNotNull, x).otherwise(lit(0.0))
    }.reduce(_ + _)
    val sp = chain("dmp")
    val sm = chain("dmm")
    val st = chain("tr")
    val pdi = lit(100.0) * sp / when(st =!= 0.0, st)
    val mdi = lit(100.0) * sm / when(st =!= 0.0, st)
    val dx = lit(100.0) * abs(pdi - mdi) /
      when(pdi + mdi =!= 0.0, pdi + mdi)
    val scored = base.select(col("ticker"), col("window_timestamp"),
      pdi.as("pdi"), mdi.as("mdi"), dx.as("dxv"))
    val adxTerms = (0 until AdxSpan).map { i =>
      val x = lag(col("dxv"), i).over(w2)
      (when(x.isNotNull, x).otherwise(lit(0.0)),
        when(x.isNotNull, lit(1L)).otherwise(lit(0L)))
    }
    val sdx = adxTerms.map(_._1).reduce(_ + _)
    val ndx = adxTerms.map(_._2).reduce(_ + _)
    scored.select(col("ticker"), col("window_timestamp"),
        round(col("pdi"), 6).as("plus_di"),
        round(col("mdi"), 6).as("minus_di"),
        round(col("dxv"), 6).as("dx"),
        when(ndx > 0, round(sdx / ndx, 6)).as("adx_14"))
      .orderBy(col("ticker"), col("window_timestamp"))
  }

  /** RSI lookback, shared with the oracle generator ([[graft.OraclesTs]]). */
  val RsiSpan = 14

  /** Bollinger lookback, shared with the oracle generator. */
  val BollSpan = 20

  /** Bollinger bands over the 5-minute close bars: trailing
    * [[BollSpan]]-bar mean ± 2 sample standard deviations. Same
    * lag-chain kernel discipline as [[ewmaBars]]/[[rsiBars]] (one
    * pinned summation order, generated oracle SQL); variance from the
    * chain's (n, Σx, Σx²) with an n>1 guard (ANSI zero-division) and a
    * `greatest(·,0)` clamp against FP-cancellation negatives. */
  def bollinger(spark: SparkSession, dir: String): DataFrame =
    bollingerBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def bollingerBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val terms = (0 until BollSpan).map { i =>
      val x = lag(col("close"), i).over(w)
      (when(x.isNotNull, x).otherwise(lit(0.0)),
        when(x.isNotNull, x * x).otherwise(lit(0.0)),
        when(x.isNotNull, lit(1L)).otherwise(lit(0L)))
    }
    val sx = terms.map(_._1).reduce(_ + _)
    val sxx = terms.map(_._2).reduce(_ + _)
    val n = terms.map(_._3).reduce(_ + _)
    val mid = sx / n
    val sd = sqrt(greatest((sxx - sx * sx / n) / (n - 1), lit(0.0)))
    bars
      .select(col("ticker"), col("bucket"), col("close"),
        round(mid, 6).as("bb_mid"),
        when(n > 1, round(mid + lit(2) * sd, 6)).as("bb_up"),
        when(n > 1, round(mid - lit(2) * sd, 6)).as("bb_dn"))
      .orderBy(col("ticker"), col("bucket"))
  }

  /** Relative Strength Index over the 5-minute close bars: average gain
    * vs average loss of the last [[RsiSpan]] price differences, folded
    * into 100·ag/(ag+al). Same kernel discipline as [[ewmaBars]]: the
    * trailing averages are explicit lag-chains (codegen'd scalar
    * expressions, summation order = textual order, stated identically
    * by the generated oracle SQL) rather than window aggregates — both
    * engines' window-aggregate internals (running accumulation vs
    * segment trees) sum floats in different orders, the lag-chain pins
    * one order for both.
    *
    * Leading edge: rows with no preceding diff (the first bar) yield
    * NULL; a zero-loss window yields 100 (the standard convention). */
  def rsi(spark: SparkSession, dir: String): DataFrame =
    rsiBars(closeBars5m(StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def rsiBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val diffs = bars
      .withColumn("diff", col("close") - lag(col("close"), 1).over(w))
    val terms = (0 until RsiSpan).map { i =>
      val d = lag(col("diff"), i).over(w)
      (when(d.isNotNull, greatest(d, lit(0.0))).otherwise(lit(0.0)),
        when(d.isNotNull, greatest(-d, lit(0.0))).otherwise(lit(0.0)),
        when(d.isNotNull, lit(1L)).otherwise(lit(0L)))
    }
    val gains = terms.map(_._1).reduce(_ + _)
    val losses = terms.map(_._2).reduce(_ + _)
    val cnt = terms.map(_._3).reduce(_ + _)
    diffs
      .select(col("ticker"), col("bucket"), col("close"),
        when(cnt === 0, lit(null))
          .when(losses === 0.0, lit(100.0))
          .otherwise(round(lit(100.0) * gains / (gains + losses), 6))
          .as("rsi_14"))
      .orderBy(col("ticker"), col("bucket"))
  }

  /** Aggregation levels for [[hurst]] — powers of two so the log-log
    * regression abscissae collapse to exact multiples of ln 2. Shared
    * with the oracle generator. */
  val HurstKs: Seq[Int] = Seq(1, 2, 4, 8)

  /** Denominator of the variance-time slope: Σ(x−x̄)² with x = ln k
    * over [[HurstKs]] equals 5·ln²2, so slope = Σ(x−x̄)·y / (5·ln²2)
    * and the ln-2 factors cancel to one division by 5·ln 2. Computed
    * once in Scala so BOTH engines parse the identical IEEE literal. */
  val HurstFiveLn2: Double = 5.0 * math.log(2.0)

  /** Hurst exponent per ticker via the variance-time (aggregated-
    * variance) method: Var of the k-bar-aggregated return scales as
    * k^2H, so the slope of ln Var_k on ln k over k ∈ {1,2,4,8} is 2H —
    * H ≈ 0.5 marks a random walk, H > 0.5 trending (long memory),
    * H < 0.5 mean reversion. The memory diagnostic that decides
    * whether momentum features are even worth computing for a symbol.
    *
    * Determinism: block sums, and the across-block moment sums behind
    * each Var_k, go through the DECIMAL(38,18) grid (order-independent
    * under any partitioning); Var_k and the closed-form slope are then
    * double math in one pinned order, with the {-1.5, -0.5, +0.5,
    * +1.5} centred-abscissa weights written out literally on both
    * engines. Only full k-blocks count (a ragged tail block would bias
    * the k-level variance). Degenerate tickers (any Var_k ≤ 0 or fewer
    * than 2 8-blocks) yield NULL.
    *
    * Scale: per-ticker row_number over the bar series (bars per
    * ticker, not raw events), then 4 hash aggregates to the (ticker,
    * block) grain and one slim pivot — no data-sized window, no
    * driver-side math. */
  def hurst(spark: SparkSession, dir: String): DataFrame =
    hurstBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def hurstBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val rets = simpleRets(bars, "r")
      .select(col("ticker"), col("r"),
        row_number().over(w).cast("long").as("idx"))
    val perK = HurstKs.map { k =>
      val blocks = rets
        .groupBy(col("ticker"), expr(s"(idx - 1) div $k").as("blk"))
        .agg(count(lit(1)).as("cnt"), dsum18(col("r")).as("y"))
        .filter(col("cnt") === k)
      blocks.groupBy(col("ticker"))
        .agg(count(lit(1)).as("n_blocks"),
          dsum18(col("y")).as("sy"),
          dsum18(col("y") * col("y")).as("syy"))
        .select(col("ticker"), lit(k).as("k"), col("n_blocks"),
          (col("syy") / col("n_blocks")
            - (col("sy") / col("n_blocks"))
              * (col("sy") / col("n_blocks"))).as("v"))
    }.reduce(_ unionAll _)
    val p = perK.groupBy(col("ticker")).agg(
      max(when(col("k") === 1, col("n_blocks"))).as("n_rets"),
      max(when(col("k") === 8, col("n_blocks"))).as("n8"),
      max(when(col("k") === 1, col("v"))).as("v1"),
      max(when(col("k") === 2, col("v"))).as("v2"),
      max(when(col("k") === 4, col("v"))).as("v4"),
      max(when(col("k") === 8, col("v"))).as("v8"))
    val slope = (lit(-1.5) * log(col("v1")) - lit(0.5) * log(col("v2"))
      + lit(0.5) * log(col("v4")) + lit(1.5) * log(col("v8"))) /
      lit(HurstFiveLn2)
    // var_k ship UNROUNDED: they are bit-deterministic through the
    // decimal grid, and a decimal round at scale 12 near 2^53/1e12
    // magnitude is where float-based SQL rounders diverge by 1 ulp
    p.select(col("ticker"), col("n_rets"),
        col("v1").as("var_1"), col("v2").as("var_2"),
        col("v4").as("var_4"), col("v8").as("var_8"),
        when(col("n8") >= 2 && col("v1") > 0.0 && col("v2") > 0.0 &&
          col("v4") > 0.0 && col("v8") > 0.0,
          round(slope / 2.0, 6)).as("hurst"))
      .orderBy(col("ticker"))
  }

  /** Kyle-lambda price impact per ticker: the OLS slope of |5-minute
    * return| on √(bar dollar volume) — how much the price concedes
    * per unit of traded size (Kyle 1985 via the Hasbrouck square-root
    * impact form). The third microstructure lens beside [[amihud]]
    * (impact per dollar) and [[rollSpread]] (implied spread): lambda
    * ranks symbols by how expensive size is to execute.
    *
    * Determinism: x = √dv and y = |r| are identically-computed
    * doubles; all four regression moments accumulate through the
    * DECIMAL(38,18) grid, and the closed-form slope/intercept is
    * double math in one pinned order (the [[Relational.regrTrend]]
    * exact-moment recipe). Bars with no previous close or zero traded
    * value drop, per the roster-wide return convention; a degenerate
    * x spread (den = 0) or a single pair yields NULL.
    *
    * Scale: one hash aggregate to 5-minute bars, one lag window over
    * bars per ticker, one moment aggregate — O(bars), never O(events),
    * after the first aggregate. */
  def kyleLambda(spark: SparkSession, dir: String): DataFrame =
    kyleLambdaBars(StockPipeline.normalize(Tables.events(spark, dir)))

  private[graft] def kyleLambdaBars(stock: DataFrame): DataFrame = {
    val bars = stock.groupBy(col("ticker"),
        timestamp_seconds(expr("unix_timestamp(ts) div 300") * 300)
          .as("bucket"))
      .agg(max_by(col("price"), col("ts")).as("close"),
        sum((col("price") * col("volume")).cast("decimal(38,10)"))
          .cast("double").as("dv"))
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val prev = lag(col("close"), 1).over(w)
    val pairs = bars.select(col("ticker"),
        when(prev =!= 0.0 && col("dv") > 0.0,
          abs(col("close") / prev - 1)).as("y"),
        when(col("dv") > 0.0, sqrt(col("dv"))).as("x"))
      .filter(col("y").isNotNull && col("x").isNotNull)
    val m = pairs.groupBy(col("ticker")).agg(
      count(lit(1)).as("n_bars"),
      dsum18(col("x")).as("sx"), dsum18(col("x") * col("x")).as("sxx"),
      dsum18(col("y")).as("sy"), dsum18(col("x") * col("y")).as("sxy"))
    val nd = col("n_bars").cast("double")
    val den = nd * col("sxx") - col("sx") * col("sx")
    // NULL-divisor guard (see ouHalfLifeBars): a degenerate x spread
    // must yield NULL, not an ANSI divide-by-zero via CSE hoisting
    val slope = (nd * col("sxy") - col("sx") * col("sy")) /
      when(den =!= 0.0, den)
    m.select(col("ticker"), col("n_bars"),
        when(col("n_bars") > 1 && den =!= 0.0,
          round(slope * lit(1000000.0), 6)).as("kyle_lambda_x1m"),
        when(col("n_bars") > 1 && den =!= 0.0,
          round((col("sy") - slope * col("sx")) / nd * lit(10000.0), 6))
          .as("intercept_bps"))
      .orderBy(col("ticker"))
  }

  /** Ornstein-Uhlenbeck mean-reversion half-life per ticker: the AR(1)
    * fit Δclose = a + b·close_prev + ε over the 5-minute bars, with
    * half-life = −ln 2 / ln(1+b) bars when −1 < b < 0 (the discrete OU
    * discretization) — how many bars a shock needs to decay halfway
    * back. The screening statistic for pairs/mean-reversion strategies
    * and the natural companion to [[hurst]] (H < 0.5 says "reverts";
    * the half-life says HOW FAST).
    *
    * Determinism: the [[kyleLambda]] exact-moment OLS recipe —
    * identically-computed double (x, y) pairs, DECIMAL(38,18) moment
    * sums, closed-form slope in one pinned order, ln on proven-parity
    * doubles. Degenerate spreads (den = 0) or n ≤ 1 yield NULL; the
    * half-life additionally requires b in (−1, 0).
    *
    * Scale: one hash aggregate to bars, one lag window per ticker,
    * one moment aggregate — O(bars) after the first aggregate. */
  def ouHalfLife(spark: SparkSession, dir: String): DataFrame =
    ouHalfLifeBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def ouHalfLifeBars(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val prev = lag(col("close"), 1).over(w)
    val pairs = bars.select(col("ticker"),
        prev.as("x"), (col("close") - prev).as("y"))
      .filter(col("x").isNotNull)
    val m = pairs.groupBy(col("ticker")).agg(
      count(lit(1)).as("n_pairs"),
      dsum18(col("x")).as("sx"), dsum18(col("x") * col("x")).as("sxx"),
      dsum18(col("y")).as("sy"), dsum18(col("x") * col("y")).as("sxy"))
    val nd = col("n_pairs").cast("double")
    val den = nd * col("sxx") - col("sx") * col("sx")
    // NULL-divisor guard: ANSI mode raises on x/0 even for doubles,
    // and subexpression elimination can hoist a shared division OUT of
    // its `when` guard — dividing by NULL instead of 0 is safe under
    // both (NULL propagates, the `when` then states the semantics)
    val b = (nd * col("sxy") - col("sx") * col("sy")) /
      when(den =!= 0.0, den)
    m.select(col("ticker"), col("n_pairs"),
        when(col("n_pairs") > 1 && den =!= 0.0, round(b, 6)).as("ou_b"),
        when(col("n_pairs") > 1 && den =!= 0.0 &&
            b > -1.0 && b < 0.0,
          round(-log(lit(2.0)) / log(lit(1.0) + b), 6))
          .as("half_life_bars"))
      .orderBy(col("ticker"))
  }

  /** Hill tail-index lookback, shared with the oracle generator. */
  val HillK = 20

  /** Hill tail-index estimator per ticker: over the [[HillK]] largest
    * absolute 5-minute returns x₁ ≥ … ≥ x_m,
    * α̂ = m / Σ ln(xᵢ/x_m) — the heavier the return tail, the SMALLER
    * α (α ≲ 3 marks infinite-kurtosis territory where variance-based
    * risk metrics lie). The order-statistics companion to the
    * moment-based kurtosis already in the roster.
    *
    * Determinism: the top set is pinned by `row_number` over
    * (|r| desc, bucket) — a stated tie rule at the k boundary; ln runs
    * on identically-computed doubles and the ln-sum accumulates on the
    * DECIMAL(38,18) grid; the closing α is double math in one pinned
    * order: m / (Σln − m·ln(x_m)). Tickers with fewer than 2 positive
    * returns, or a degenerate sum (all top returns equal), yield NULL.
    *
    * Scale: a PER-TICKER ROWS window over bars (never raw events) and
    * one hash aggregate — the top-k selection is O(bars) with bounded
    * per-partition state. */
  def hillTail(spark: SparkSession, dir: String): DataFrame =
    hillTailBars(closeBars5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def hillTailBars(bars: DataFrame): DataFrame = {
    // abs() of the shared return block is value-identical to the
    // oracle's abs-inside-the-guard form
    val rets = simpleRets(bars, "r0")
      .select(col("ticker"), col("bucket"), abs(col("r0")).as("r"))
      .filter(col("r") > 0.0)
    val topW = Window.partitionBy(col("ticker"))
      .orderBy(col("r").desc, col("bucket"))
    val top = rets
      .withColumn("rn", row_number().over(topW))
      .filter(col("rn") <= HillK)
    val m = top.groupBy(col("ticker")).agg(
      count(lit(1)).as("n_tail"),
      min(col("r")).as("r_k"),
      dsum18(log(col("r"))).as("sln"))
    val denom = col("sln") - col("n_tail").cast("double") * log(col("r_k"))
    // NULL-divisor guard (see ouHalfLifeBars)
    m.select(col("ticker"), col("n_tail"), round(col("r_k"), 6).as("r_k"),
        when(col("n_tail") > 1 && denom > 0.0,
          round(col("n_tail").cast("double") /
            when(denom > 0.0, denom), 6)).as("hill_alpha"))
      .orderBy(col("ticker"))
  }

  /** CUSUM change-point screen per ticker: S_t = Σ_{i≤t} (rᵢ − r̄) —
    * the classic drift detector (a mean shift makes |S| ramp; a
    * stationary series random-walks near zero). Reports the maximum
    * excursion max|S|, the FIRST bucket attaining it (the break
    * candidate), and the scale-free statistic max|S| / (σ·√n) whose
    * large values reject "no change" (the Brownian-bridge sup
    * normalization). The data-quality twin of the market use: run it
    * on any metric stream to find regime/pipeline breaks.
    *
    * Determinism: the running sum is a DECIMAL(38,18) window cumsum —
    * exact, so both engines hold bit-identical S_t (a double running
    * sum would depend on each engine's window accumulation internals;
    * the roster-wide reason lag-chains exist). The break bucket is an
    * EXACT-decimal equality probe (the [[StockPipeline.drawdown]]
    * scalar-max pattern, strengthened: no rounding needed when the
    * compared values are exact decimals) with a stated min-bucket tie
    * rule. σ and the closing
    * ratio are double math in one pinned order; σ = 0 yields NULL
    * stat via the NULL-divisor guard.
    *
    * Scale: returns, one per-ticker aggregate (broadcast back), ONE
    * ordered window over bars per ticker (O(bars), never events), one
    * final aggregate. */
  def cusumBreaks(spark: SparkSession, dir: String): DataFrame =
    cusumBars(closeBars5m(StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def cusumBars(bars: DataFrame): DataFrame = {
    val rets = simpleRets(bars, "r")
    val m = rets.groupBy(col("ticker")).agg(
      count(lit(1)).as("n_rets"),
      dsum18(col("r")).as("s1"), dsum18(col("r") * col("r")).as("s2"))
    val nd = col("n_rets").cast("double")
    val mean = col("s1") / nd
    val stats = m.select(col("ticker"), col("n_rets"), mean.as("mu"),
      sqrt(greatest(col("s2") / nd - mean * mean, lit(0.0))).as("sd"))
    val w = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withS = rets.join(broadcast(stats), Seq("ticker"))
      .withColumn("s_abs", abs(
        sum((col("r") - col("mu")).cast("decimal(38,18)")).over(w)))
    val peak = withS.groupBy(col("ticker"))
      .agg(max(col("s_abs")).as("s_max"))
    withS.join(broadcast(peak), Seq("ticker"))
      .filter(col("s_abs") === col("s_max"))
      .groupBy(col("ticker"))
      .agg(max(col("n_rets")).as("n_rets"),
        min(col("bucket")).as("break_bucket"),
        max(col("s_max").cast("double")).as("sm"),
        max(col("sd")).as("sdv"))
      .select(col("ticker"), col("n_rets"), col("break_bucket"),
        round(col("sm"), 6).as("cusum_max"),
        when(col("sdv") > 0.0,
          round(col("sm") / when(col("sdv") > 0.0,
            col("sdv") * sqrt(col("n_rets").cast("double"))), 6))
          .as("cusum_stat"))
      .orderBy(col("ticker"))
  }

  /** Cross-ticker lead-lag correlation: for every ORDERED pair
    * (lead, lag), the correlation of the lead ticker's 5-minute return
    * at t with the lag ticker's return at t+5m — the price-discovery
    * screen (a significantly asymmetric matrix says one symbol's moves
    * anticipate another's; the contemporaneous symmetric matrix is
    * [[corrPairs]]).
    *
    * Determinism: the [[corrPairsBars]] recipe — identical lag-window
    * returns, a bucket-shift equi-join (never all-pairs-in-time), the
    * engines' native `corr` (parity proven by `stock_corr_pairs`) with
    * the NaN→NULL normalization, rounded to the 1e-6 grid.
    *
    * Scale: the join keys on the 5-minute bucket — per-bucket fan-out
    * is #tickers², a fixed universe, never data-sized; the aggregate
    * grain is the bounded ordered-pair grid. */
  def leadLag(spark: SparkSession, dir: String): DataFrame =
    leadLagBars(closeBars5m(StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def leadLagBars(bars: DataFrame): DataFrame = {
    val rets = simpleRets(bars, "ret")
    val x = rets.select(col("ticker").as("ticker_lead"), col("bucket"),
      col("ret").as("r_t"))
    val y = rets.select(col("ticker").as("ticker_lag"),
      (col("bucket") - expr("INTERVAL 5 MINUTES")).as("bucket"),
      col("ret").as("r_next"))
    x.join(y, Seq("bucket"))
      .filter(col("ticker_lead") =!= col("ticker_lag"))
      .groupBy(col("ticker_lead"), col("ticker_lag"))
      .agg(count(lit(1)).as("n_buckets"),
        round(nanToNull(corr(col("r_t"), col("r_next"))), 6)
          .as("lead_corr"))
      .orderBy(col("ticker_lead"), col("ticker_lag"))
  }

  /** Range-based volatility estimator panel per ticker over the
    * 5-minute OHLC bars: Parkinson (1980) — ln²(H/L) scaled by
    * 1/(4 ln 2), ~5× more efficient than close-close when there are no
    * jumps; Rogers–Satchell (1991) — ln(H/C)ln(H/O) + ln(L/C)ln(L/O),
    * drift-robust; and the plain close-close realized vol as the
    * anchor, plus the Parkinson/close-close efficiency ratio (≫1 says
    * the bars trend within themselves — jump/drift contamination; ≈1
    * says ranges add nothing). The estimator-selection panel a vol
    * desk reads before trusting any single estimator.
    *
    * Determinism: bars with any non-positive price are excluded
    * upfront (ln-domain, both engines state the filter); every
    * per-bar term is closed-form double math rounded to the 1e-12
    * grid and summed as DECIMAL(38,18); the closing sqrt/ratio math is
    * pinned-order doubles with NULL-divisor guards. Scale: one bar
    * window pass + one hash aggregate per ticker. */
  def volPanel(spark: SparkSession, dir: String): DataFrame =
    volPanelOhlc(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def volPanelOhlc(ohlc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val base = ohlc
      .filter(col("low") > 0.0 && col("open") > 0.0 && col("close") > 0.0)
      .select(col("ticker"), col("open"), col("high"), col("low"),
        col("close"), lag(col("close"), 1).over(w).as("pc"))
    val lhl = log(col("high") / col("low"))
    val rsT = log(col("high") / col("close")) * log(col("high") / col("open")) +
      log(col("low") / col("close")) * log(col("low") / col("open"))
    val ccT = log(col("close") / when(col("pc") > 0.0, col("pc")))
    val terms = base.select(col("ticker"),
      round(lhl * lhl, 12).as("park_t"),
      round(rsT, 12).as("rs_t"),
      round(ccT * ccT, 12).as("cc_t"))
    val fourLn2 = lit(4.0 * math.log(2.0))
    val m = terms.groupBy(col("ticker"))
      .agg(count(lit(1)).as("n_bars"),
        dsum18(col("park_t")).as("sp"),
        dsum18(col("rs_t")).as("sr"),
        dsum18(col("cc_t")).as("sc"),
        count(col("cc_t")).as("nc"))
    m.select(col("ticker"), col("n_bars"),
        round(sqrt(col("sp") / col("n_bars") / fourLn2), 6)
          .as("vol_parkinson"),
        round(sqrt(greatest(col("sr") / col("n_bars"), lit(0.0))), 6)
          .as("vol_rogers_satchell"),
        when(col("nc") > 0,
          round(sqrt(col("sc") / when(col("nc") > 0, col("nc"))
            .cast("double")), 6)).as("vol_close_close"),
        when(col("nc") > 0 && col("sc") > 0.0,
          round(sqrt(col("sp") / col("n_bars") / fourLn2) /
            when(col("sc") > 0.0,
              sqrt(col("sc") / when(col("nc") > 0, col("nc"))
                .cast("double"))), 6)).as("park_cc_ratio"))
      .orderBy(col("ticker"))
  }

  /** Bar widths (seconds) for the Epps-effect panel — shared with the
    * oracle generator. */
  val EppsWidths: Seq[Int] = Seq(60, 300, 900)

  /** Epps effect panel: every ticker pair's return correlation at
    * 1-minute, 5-minute and 15-minute sampling — the classic
    * microstructure finding (Epps 1979) that measured cross-correlation
    * DECAYS as the sampling grid gets finer, because trades are
    * asynchronous across symbols. A correlation consumer (risk model,
    * pairs strategy) reads this panel to pick the coarsest grid whose
    * correlation has converged.
    *
    * Determinism: per width, the exact [[corrPairsBars]] recipe —
    * identical bucketing/returns, native `corr` with NaN→NULL, 1e-6
    * grid. Scale: per width one bar aggregate + a bucket-keyed pair
    * join (fan-out = #tickers² per bucket, fixed universe); three
    * widths = three independent slim passes. */
  def eppsEffect(spark: SparkSession, dir: String): DataFrame = {
    val stock = StockPipeline.normalize(Tables.events(spark, dir))
    val panels = EppsWidths.map { sec =>
      val bars = stock
        .groupBy(col("ticker"),
          timestamp_seconds(expr(s"unix_timestamp(ts) div $sec") * sec)
            .as("bucket"))
        .agg(max_by(col("price"), col("ts")).as("close"))
      corrPairsBars(bars)
        .select(lit(sec.toLong).as("width_s"), col("ticker_a"),
          col("ticker_b"), col("n_buckets"), col("ret_corr"))
    }
    panels.reduce(_ unionByName _)
      .orderBy(col("width_s"), col("ticker_a"), col("ticker_b"))
  }

  /** Corwin–Schultz (2012) high–low spread estimator per ticker: over
    * every consecutive 5-minute OHLC bar pair, β = ln²(H₁/L₁) +
    * ln²(H₂/L₂), γ = ln²(H₂ᵇᵃʳ/L₂ᵇᵃʳ) over the two-bar high/low span,
    * α = (√(2β) − √β)/(3 − 2√2) − √(γ/(3 − 2√2)), and the implied
    * proportional spread s = 2(eᵅ − 1)/(1 + eᵅ) — the classic
    * estimate-the-bid-ask-spread-without-quotes trick (negative pair
    * estimates floor at 0 in the standard convention; the raw mean is
    * reported beside it, as the paper recommends checking).
    *
    * Determinism: the pair block is a single lag window; every pair's
    * spread is closed-form double math on identical inputs with the ln
    * arguments NULL-guarded (L > 0 — the engine-wide ln-domain
    * convention); the per-ticker means accumulate as DECIMAL(38,18) of
    * 1e-12-grid terms. Scale: bars per ticker, one window pass + one
    * hash aggregate — never event-grain. */
  def corwinSchultz(spark: SparkSession, dir: String): DataFrame =
    corwinSchultzOhlc(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def corwinSchultzOhlc(ohlc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val ph = lag(col("high"), 1).over(w)
    val pl = lag(col("low"), 1).over(w)
    val pairs = ohlc.select(col("ticker"), col("high"), col("low"),
        ph.as("ph"), pl.as("pl"))
      .filter(col("ph").isNotNull &&
        col("pl") > 0.0 && col("low") > 0.0)
    val hl1 = log(when(col("pl") > 0.0, col("ph") / col("pl")))
    val hl2 = log(when(col("low") > 0.0, col("high") / col("low")))
    val h2 = greatest(col("ph"), col("high"))
    val l2 = least(col("pl"), col("low"))
    val gln = log(when(l2 > 0.0, h2 / l2))
    val k = lit(3.0 - 2.0 * math.sqrt(2.0))
    val scored = pairs
      .select(col("ticker"),
        (hl1 * hl1 + hl2 * hl2).as("beta"), (gln * gln).as("gamma"))
      .select(col("ticker"),
        ((sqrt(lit(2.0) * col("beta")) - sqrt(col("beta"))) / k -
          sqrt(col("gamma") / k)).as("alpha"))
      .select(col("ticker"),
        (lit(2.0) * (exp(col("alpha")) - 1) /
          (lit(1.0) + exp(col("alpha")))).as("s"))
    scored.groupBy(col("ticker"))
      .agg(count(lit(1)).as("n_pairs"),
        round(dsum18(round(col("s"), 12)) / count(lit(1)), 6)
          .as("avg_spread_raw"),
        round(dsum18(round(greatest(col("s"), lit(0.0)), 12)) /
          count(lit(1)), 6).as("avg_spread"))
      .orderBy(col("ticker"))
  }

  /** Keltner EMA / ATR lookbacks, shared with the oracle generator. */
  val KeltSpan = 20
  val KeltAtrSpan = 10
  private val KeltAlpha = 2.0 / (KeltSpan + 1)

  /** Keltner channel over the 5-minute OHLC bars: middle line = a
    * [[KeltSpan]]-bar EMA of the close ([[ewmaBars]]'s truncated
    * weighted lag-chain — one pinned summation order on both
    * engines), band half-width = 2 × the trailing [[KeltAtrSpan]]-bar
    * mean true range ([[atr]]'s chain). The volatility-adaptive
    * sibling of [[donchian]]: same breakout consumer, ATR-scaled
    * instead of extremum-scaled.
    *
    * Determinism: both chains are textual-order lag sums (no decimal
    * grid needed — no aggregate crosses rows outside the pinned
    * chains); first-bar TR is NULL and contributes the same literal
    * 0.0 on both engines; a bar with zero TR observations (never past
    * the first bar) yields NULL bands via the count guard. */
  def keltner(spark: SparkSession, dir: String): DataFrame =
    keltnerOhlc(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def keltnerOhlc(ohlc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val pc = lag(col("close"), 1).over(w)
    val base = ohlc.select(col("ticker"), col("window_timestamp"),
      col("close"),
      when(pc.isNotNull,
        greatest(col("high") - col("low"), abs(col("high") - pc),
          abs(col("low") - pc))).as("tr"))
    val w2 = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val decay = 1.0 - KeltAlpha
    val emaTerms = (0 until KeltSpan).map { i =>
      val x = lag(col("close"), i).over(w2)
      val wt = math.pow(decay, i)
      (when(x.isNotNull, x * lit(wt)).otherwise(lit(0.0)),
        when(x.isNotNull, lit(wt)).otherwise(lit(0.0)))
    }
    val mid = emaTerms.map(_._1).reduce(_ + _) /
      emaTerms.map(_._2).reduce(_ + _)
    val atrTerms = (0 until KeltAtrSpan).map { i =>
      val x = lag(col("tr"), i).over(w2)
      (when(x.isNotNull, x).otherwise(lit(0.0)),
        when(x.isNotNull, lit(1L)).otherwise(lit(0L)))
    }
    val atrSum = atrTerms.map(_._1).reduce(_ + _)
    val atrCnt = atrTerms.map(_._2).reduce(_ + _)
    val atrC = when(atrCnt > 0, atrSum / atrCnt)
    base.select(col("ticker"), col("window_timestamp"), col("close"),
        round(mid, 6).as("kc_mid"),
        round(mid + lit(2.0) * atrC, 6).as("kc_up"),
        round(mid - lit(2.0) * atrC, 6).as("kc_dn"))
      .orderBy(col("ticker"), col("window_timestamp"))
  }

  /** CCI lookback, shared with the oracle generator. */
  val CciSpan = 20

  /** Commodity Channel Index over the 5-minute OHLC bars: typical
    * price tp = (H+L+C)/3, its trailing [[CciSpan]]-bar mean, the
    * mean ABSOLUTE deviation of the window's tp values from the
    * CURRENT window mean (Lambert's definition — deviation from one
    * anchor, not per-row means), and CCI = (tp − sma)/(0.015·md).
    * A two-level lag-chain like [[adx]]: level 1 pins the sma chain,
    * level 2 re-lags tp against the level-1 sma.
    *
    * Determinism: both chains are pinned textual-order sums over
    * identical double inputs; zero mean-deviation (a constant-tp
    * window) yields NULL CCI via the ≠0 guard on both engines. */
  def cci(spark: SparkSession, dir: String): DataFrame =
    cciOhlc(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def cciOhlc(ohlc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val base = ohlc.select(col("ticker"), col("window_timestamp"),
      ((col("high") + col("low") + col("close")) / 3.0).as("tp"))
    val smaTerms = (0 until CciSpan).map { i =>
      val x = lag(col("tp"), i).over(w)
      (when(x.isNotNull, x).otherwise(lit(0.0)),
        when(x.isNotNull, lit(1L)).otherwise(lit(0L)))
    }
    val sma = smaTerms.map(_._1).reduce(_ + _) /
      smaTerms.map(_._2).reduce(_ + _)
    val lvl1 = base.select(col("ticker"), col("window_timestamp"),
      col("tp"), sma.as("sma"))
    val mdTerms = (0 until CciSpan).map { i =>
      val x = lag(col("tp"), i).over(w)
      (when(x.isNotNull, abs(x - col("sma"))).otherwise(lit(0.0)),
        when(x.isNotNull, lit(1L)).otherwise(lit(0L)))
    }
    val md = mdTerms.map(_._1).reduce(_ + _) /
      mdTerms.map(_._2).reduce(_ + _)
    lvl1.select(col("ticker"), col("window_timestamp"),
        round(col("tp"), 6).as("tp"),
        round(col("sma"), 6).as("tp_sma"),
        round(md, 6).as("mean_dev"),
        when(md =!= 0.0,
          round((col("tp") - col("sma")) / (lit(0.015) * md), 6))
          .as("cci_20"))
      .orderBy(col("ticker"), col("window_timestamp"))
  }

  /** Williams %R lookback, shared with the oracle generator. */
  val WillSpan = 14

  /** Williams %R over the 5-minute OHLC bars: −100·(HH−close)/(HH−LL)
    * over the trailing [[WillSpan]] bars — [[stochastic]]'s %K
    * reflected to the −100..0 scale, the overbought/oversold gauge.
    * HH/LL are frame max/min (order-insensitive — no chain needed);
    * a flat window (HH = LL) yields NULL via the ≠ guard. */
  def williamsR(spark: SparkSession, dir: String): DataFrame =
    williamsROhlc(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def williamsROhlc(ohlc: DataFrame): DataFrame = {
    val tw = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val span = tw.rowsBetween(-(WillSpan - 1), Window.currentRow)
    val hh = max(col("high")).over(span)
    val ll = min(col("low")).over(span)
    ohlc.select(col("ticker"), col("window_timestamp"), col("close"),
        round(hh, 6).as("hh"), round(ll, 6).as("ll"),
        when(hh =!= ll,
          round(lit(-100.0) * (hh - col("close")) / (hh - ll), 6))
          .as("williams_r"))
      .orderBy(col("ticker"), col("window_timestamp"))
  }

  /** Aroon lookback, shared with the oracle generator. */
  val AroonSpan = 25

  /** Aroon indicator over the 5-minute OHLC bars: within the trailing
    * [[AroonSpan]]-bar window, the bar-age of the highest high and
    * lowest low (MOST-RECENT attainment wins ties — a stated rule,
    * evaluated as an ascending-lag CASE chain, not argmax luck);
    * aroon_up = 100·(span−1−age_hh)/(span−1), aroon_dn symmetric,
    * and the oscillator up−dn. The age probe compares each lagged
    * double against the frame max/min — bit-identical stored values
    * on both engines, so equality is engine-stable. */
  def aroon(spark: SparkSession, dir: String): DataFrame =
    aroonOhlc(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def aroonOhlc(ohlc: DataFrame): DataFrame = {
    val tw = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val span = tw.rowsBetween(-(AroonSpan - 1), Window.currentRow)
    val hh = max(col("high")).over(span)
    val ll = min(col("low")).over(span)
    def age(c: String, anchor: org.apache.spark.sql.Column) = {
      val cases = (0 until AroonSpan).map { i =>
        (lag(col(c), i).over(tw) === anchor, lit(i))
      }
      cases.tail.foldLeft(when(cases.head._1, cases.head._2)) {
        (acc, c) => acc.when(c._1, c._2)
      }
    }
    val ageHH = age("high", hh)
    val ageLL = age("low", ll)
    val den = lit((AroonSpan - 1).toDouble)
    ohlc.select(col("ticker"), col("window_timestamp"),
        ageHH.as("bars_since_hh"), ageLL.as("bars_since_ll"),
        round(lit(100.0) * (den - ageHH) / den, 6).as("aroon_up"),
        round(lit(100.0) * (den - ageLL) / den, 6).as("aroon_dn"),
        round(lit(100.0) * (den - ageHH) / den -
          lit(100.0) * (den - ageLL) / den, 6).as("aroon_osc"))
      .orderBy(col("ticker"), col("window_timestamp"))
  }

  /** Vortex lookback, shared with the oracle generator. */
  val VortexSpan = 14

  /** Vortex indicator over the 5-minute OHLC bars: per bar the
    * vortex movements VM+ = |H − prev L| and VM− = |L − prev H| and
    * the true range; VI± = ΣVM±/ΣTR over the trailing
    * [[VortexSpan]]-bar chains — the trend-reversal gauge whose
    * crossovers mirror [[adx]]'s DI pair but with cross-bar extremum
    * distances instead of directional moves.
    *
    * Determinism: one lag window then pinned textual-order chains;
    * first-bar VM/TR are NULL → literal 0.0; zero ΣTR → NULL via the
    * divisor guard, identical in the oracle. */
  def vortex(spark: SparkSession, dir: String): DataFrame =
    vortexOhlc(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def vortexOhlc(ohlc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val ph = lag(col("high"), 1).over(w)
    val pl = lag(col("low"), 1).over(w)
    val pc = lag(col("close"), 1).over(w)
    val base = ohlc.select(col("ticker"), col("window_timestamp"),
      when(pl.isNotNull, abs(col("high") - pl)).as("vmp"),
      when(ph.isNotNull, abs(col("low") - ph)).as("vmm"),
      when(pc.isNotNull,
        greatest(col("high") - col("low"), abs(col("high") - pc),
          abs(col("low") - pc))).as("tr"))
    val w2 = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    def chain(c: String) = (0 until VortexSpan).map { i =>
      val x = lag(col(c), i).over(w2)
      when(x.isNotNull, x).otherwise(lit(0.0))
    }.reduce(_ + _)
    val sp = chain("vmp")
    val sm = chain("vmm")
    val st = chain("tr")
    base.select(col("ticker"), col("window_timestamp"),
        when(st =!= 0.0, round(sp / st, 6)).as("vi_plus"),
        when(st =!= 0.0, round(sm / st, 6)).as("vi_minus"),
        when(st =!= 0.0, round(sp / st - sm / st, 6)).as("vi_diff"))
      .orderBy(col("ticker"), col("window_timestamp"))
  }

  /** Tick-rule trade classification + order-flow imbalance per
    * 5-minute bar: each event is buyer-initiated (+1) when its price
    * upticks, seller-initiated (−1) on a downtick, and INHERITS the
    * last classification on a zero tick (the Lee–Ready tick-rule
    * carry, expressed as `last(tick, ignoreNulls)` over the
    * (ts, event_id)-ordered per-ticker stream — a stated total order,
    * no lag-on-ties luck); the leading unclassified run stays NULL
    * and is reported as its own volume bucket. Per bar: signed volume
    * split and OFI = (buy−sell)/(buy+sell) — the order-flow pressure
    * signal [[kyleLambda]] regresses against and [[vpin]] buckets.
    *
    * Determinism: classification is integer; volumes are integral
    * sums; OFI is one guarded integer-ratio division (oracle
    * normalizes the −0.0 edge). Scale: the event-grain windows run
    * per (ticker, day-bucket) — parallelism is symbols × days, never
    * one task per symbol's whole history — with exactness across
    * bucket boundaries restored by two O(buckets) carry summaries
    * (the [[StockPipeline.withSpikeBucketed]] recipe; here the carry
    * is even cheaper — ONE price and ONE side per boundary, vs
    * spike's last-10 tail). Then a bar-grain hash aggregate. */
  def tickRule(spark: SparkSession, dir: String): DataFrame =
    tickRuleEvents(StockPipeline.normalize(Tables.events(spark, dir)))

  /** Day-bucket width for [[tickSides]] — wide enough that the two
    * bucket-grain carry summaries stay metadata-sized (symbols × days
    * rows), narrow enough that no single in-bucket sort outgrows a
    * task at exchange feed rates. */
  private[graft] val TickBucketSeconds = 86400L

  /** The classified event stream the bar aggregate folds — split out
    * for the [[graft.streaming.TickState]] twin's parity spec.
    * Delegates to the bucketed form; [[tickSidesGlobal]] is the
    * single-window statement the oracle mirrors and
    * `TickRuleParitySpec` proves equal. */
  private[graft] def tickSides(stock: DataFrame): DataFrame =
    tickSidesBucketed(stock, TickBucketSeconds)

  /** The tick-rule classifier as ONE ticker-partitioned running
    * window — the semantics statement (and the shape the DuckDB
    * oracle states verbatim). Correct at any scale but serial per
    * symbol: one task sorts a ticker's entire trade history, the
    * exact single-task-per-key ceiling the spike operator hit in
    * round 1. Kept for the row-for-row parity proof only; the
    * registered query runs [[tickSidesBucketed]]. */
  private[graft] def tickSidesGlobal(stock: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker"))
      .orderBy(col("ts"), col("event_id"))
    val diff = col("price") - lag(col("price"), 1).over(w)
    val ticked = stock.select(col("ticker"), col("ts"), col("volume"),
      col("event_id"),
      when(diff > 0.0, lit(1)).when(diff < 0.0, lit(-1)).as("tick"))
    ticked.select(col("ticker"), col("ts"), col("event_id"), col("volume"),
      last(col("tick"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("side"),
      (sum(col("volume"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
        col("volume")).as("cum_excl"))
  }

  /** [[tickSidesGlobal]] at scale: ONE event-grain window pass
    * classifies within (ticker, day-bucket) windows — the head row's
    * tick is deliberately left NULL there — and a bucket-grain
    * summary restores cross-boundary exactness: each bucket's HEAD
    * tick is computable at summary grain (first price vs the previous
    * NON-EMPTY bucket's closing price — a `lag` over the summary, so
    * multi-day gaps are handled by construction: empty buckets simply
    * have no summary row), and a bucket-leading unclassified run
    * inherits the last non-null tick of any earlier bucket (a running
    * `last ignoreNulls` over the same summary grain, where a bucket's
    * last tick is its last in-bucket tick, else its head tick).
    *
    * A row's global side is then exactly
    * `coalesce(in-bucket running last, head_tick, carry_side)`: local
    * ticks (rows ≥ 2) are always LATER than the head tick, which is
    * always later than anything carried in — row-for-row proven by
    * `TickRuleParitySpec` on real data and a bursty multi-day-gap
    * fixture. One event-grain materialization, one O(symbols × days)
    * summary, one (ticker, bucket) equi-join back.
    *
    * Also emits `cum_excl`, the EXCLUSIVE running volume in the same
    * (ts, event_id) order — in-bucket cumsum + the previous buckets'
    * exclusive volume prefix, both riding window frames that already
    * exist in the pass ([[vpin]] sequences its equal-volume buckets on
    * it; the parity spec proves it against the global running sum). */
  private[graft] def tickSidesBucketed(stock: DataFrame,
      bucketSeconds: Long): DataFrame = {
    val wB = Window.partitionBy(col("ticker"), col("bucket"))
      .orderBy(col("ts"), col("event_id"))
    val diff = col("price") - lag(col("price"), 1).over(wB)
    val local = stock
      .select(col("ticker"), col("ts"), col("event_id"), col("volume"),
        col("price"),
        expr(s"unix_timestamp(ts) div $bucketSeconds").as("bucket"))
      .select(col("ticker"), col("bucket"), col("ts"), col("event_id"),
        col("volume"), col("price"),
        when(diff > 0.0, lit(1)).when(diff < 0.0, lit(-1)).as("tick"))
      .withColumn("side_local",
        last(col("tick"), ignoreNulls = true)
          .over(wB.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      // exclusive in-bucket volume cumsum: same running frame (and so
      // the same WindowExec) as side_local — consumers that sequence
      // by traded volume (vpin) get the global cumsum from this plus
      // the bucket-grain volume offset below, never a second
      // event-grain window pass
      .withColumn("cum_in",
        sum(col("volume")).over(wB.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)) - col("volume"))
      .pin()
    val wSum = Window.partitionBy(col("ticker")).orderBy(col("bucket"))
    val summary = local.groupBy(col("ticker"), col("bucket"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("price")))
          .getField("price").as("first_price"),
        max(struct(col("ts"), col("event_id"), col("price")))
          .getField("price").as("last_price"),
        max(when(col("tick").isNotNull,
            struct(col("ts"), col("event_id"), col("tick"))))
          .getField("tick").as("last_local_tick"),
        sum(col("volume")).as("bucket_vol"))
    val headDiff = col("first_price") - lag(col("last_price"), 1).over(wSum)
    val carries = summary
      .withColumn("head_tick",
        when(headDiff > 0.0, lit(1)).when(headDiff < 0.0, lit(-1)))
      .withColumn("carry_side",
        last(coalesce(col("last_local_tick"), col("head_tick")),
            ignoreNulls = true)
          .over(wSum.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("vol_offset",
        sum(col("bucket_vol"))
          .over(wSum.rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("ticker"), col("bucket"), col("head_tick"),
        col("carry_side"), col("vol_offset"))
    local.join(carries, Seq("ticker", "bucket"))
      .select(col("ticker"), col("ts"), col("event_id"), col("volume"),
        coalesce(col("side_local"), col("head_tick"), col("carry_side"))
          .as("side"),
        (coalesce(col("vol_offset"), lit(0L)) + col("cum_in"))
          .as("cum_excl"))
  }

  private[graft] def tickRuleEvents(stock: DataFrame): DataFrame = {
    val sided = tickSides(stock)
    val buy = sum(when(col("side") === 1, col("volume")).otherwise(lit(0L)))
    val sell = sum(when(col("side") === -1, col("volume")).otherwise(lit(0L)))
    sided
      .groupBy(window(col("ts"), "5 minutes"), col("ticker"))
      .agg(count(lit(1)).as("n_events"),
        buy.as("buy_vol"), sell.as("sell_vol"),
        sum(when(col("side").isNull, col("volume")).otherwise(lit(0L)))
          .as("unclassified_vol"))
      .select(col("ticker"), col("window.end").as("window_timestamp"),
        col("n_events"), col("buy_vol"), col("sell_vol"),
        col("unclassified_vol"),
        when(col("buy_vol") + col("sell_vol") > 0,
          round((col("buy_vol") - col("sell_vol")) /
            (col("buy_vol") + col("sell_vol")), 6)).as("ofi"))
      .orderBy(col("ticker"), col("window_timestamp"))
  }

  /** Volume-profile bucket count, shared with the oracle generator. */
  val VpBuckets = 20

  /** Volume-at-price profile per ticker: the session's traded volume
    * binned into [[VpBuckets]] equal price buckets between the
    * ticker's min and max trade price, with each bucket's share and
    * the point of control (VPOC — the highest-volume bucket, ties to
    * the LOWEST bucket, a stated rule) — the market-profile view a
    * liquidity consumer reads next to [[vwap]] (where is volume
    * CONCENTRATED, not just its mean).
    *
    * Determinism: bucket = floor((p−min)/(max−min)·20) clamped to 19
    * — identical double ops on both engines; volumes are integral;
    * shares are one integer-ratio division; a flat ticker (max = min)
    * puts everything in bucket 0 via the range guard. Scale: one
    * min/max aggregate + one bucket aggregate (both map-side
    * combining), then a 20-row-per-ticker grid — the window runs on
    * the GRID, never the data. */
  def volumeProfile(spark: SparkSession, dir: String): DataFrame =
    volumeProfileEvents(StockPipeline.normalize(Tables.events(spark, dir)))

  private[graft] def volumeProfileEvents(stock: DataFrame): DataFrame = {
    val bounds = stock.groupBy(col("ticker"))
      .agg(min(col("price")).as("p_min"), max(col("price")).as("p_max"))
    val b = lit(VpBuckets)
    val bucket = when(col("p_max") === col("p_min"), lit(0L))
      .otherwise(least(
        floor((col("price") - col("p_min")) /
          (col("p_max") - col("p_min")) * b).cast("long"),
        lit(VpBuckets - 1L)))
    val binned = stock.join(bounds, Seq("ticker"))
      .select(col("ticker"), col("p_min"), col("p_max"), col("volume"),
        bucket.as("bucket"))
      .groupBy(col("ticker"), col("p_min"), col("p_max"), col("bucket"))
      .agg(sum(col("volume")).as("volume"), count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("ticker"))
    val width = (col("p_max") - col("p_min")) / b
    val tiered = binned
      .select(col("ticker"), col("bucket"),
        round(col("p_min") + col("bucket") * width, 6).as("bucket_lo"),
        round(col("p_min") + (col("bucket") + 1) * width, 6)
          .as("bucket_hi"),
        col("volume"), col("n_events"),
        round(col("volume") / sum(col("volume")).over(w), 6).as("share"),
        (col("volume") === max(col("volume")).over(w)).as("at_max"))
    tiered
      .select(col("ticker"), col("bucket"), col("bucket_lo"),
        col("bucket_hi"), col("volume"), col("n_events"), col("share"),
        (col("at_max") && col("bucket") ===
          min(when(col("at_max"), col("bucket"))).over(w)).as("is_vpoc"))
      .orderBy(col("ticker"), col("bucket"))
  }

  /** MFI lookback, shared with the oracle generator. */
  val MfiSpan = 14

  /** Money Flow Index over the 5-minute OHLC bars: typical price
    * tp = (H+L+C)/3, raw money flow = tp · bar volume, classified
    * positive/negative by tp vs the previous bar's tp (equal tp
    * contributes to NEITHER side — the standard convention); MFI =
    * 100·ΣMF⁺/(ΣMF⁺+ΣMF⁻) over the trailing [[MfiSpan]]-bar chains —
    * the volume-weighted RSI.
    *
    * Determinism: volume is integral (BIGINT sums per bar), tp·vol is
    * one double product per bar, chains are pinned textual order;
    * zero total flow → NULL via the divisor guard. */
  def mfi(spark: SparkSession, dir: String): DataFrame =
    mfiOhlc(StockPipeline.ohlc5m(
      StockPipeline.normalize(Tables.events(spark, dir))))

  private[graft] def mfiOhlc(ohlc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    val base0 = ohlc.select(col("ticker"), col("window_timestamp"),
      ((col("high") + col("low") + col("close")) / 3.0).as("tp"),
      col("volume"))
    val ptp = lag(col("tp"), 1).over(w)
    val base = base0.select(col("ticker"), col("window_timestamp"),
      when(ptp.isNotNull && col("tp") > ptp,
        col("tp") * col("volume")).otherwise(lit(0.0)).as("mfp"),
      when(ptp.isNotNull && col("tp") < ptp,
        col("tp") * col("volume")).otherwise(lit(0.0)).as("mfm"),
      when(ptp.isNotNull, lit(1L)).otherwise(lit(0L)).as("scored"))
    val w2 = Window.partitionBy(col("ticker")).orderBy(col("window_timestamp"))
    def chain(c: String) = (0 until MfiSpan).map { i =>
      val x = lag(col(c), i).over(w2)
      when(x.isNotNull, x).otherwise(lit(0.0))
    }.reduce(_ + _)
    val sp = chain("mfp")
    val sm = chain("mfm")
    val sn = (0 until MfiSpan).map { i =>
      val x = lag(col("scored"), i).over(w2)
      when(x.isNotNull, x).otherwise(lit(0L))
    }.reduce(_ + _)
    base.select(col("ticker"), col("window_timestamp"),
        sn.as("n_scored"),
        when(sp + sm =!= 0.0, round(lit(100.0) * sp / (sp + sm), 6))
          .as("mfi_14"))
      .orderBy(col("ticker"), col("window_timestamp"))
  }
}
