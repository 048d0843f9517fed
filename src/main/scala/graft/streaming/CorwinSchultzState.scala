package graft.streaming

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-trigger Corwin–Schultz report — schema matches the batch
  * `corwinSchultzOhlc` output row; the newest (highest `n_pairs`)
  * emission per ticker supersedes older ones (the [[CusumRow]]
  * convention). */
case class CsRow(ticker: String, n_pairs: Long, avg_spread_raw: Double,
    avg_spread: Double)

/** Streaming Corwin–Schultz spread estimator on `transformWithState` —
  * the twin of the batch `corwinSchultzOhlc` kernel
  * (`operators/TimeSeries.scala`), bit-identical across any trigger
  * split (spec-asserted).
  *
  * Unlike [[CusumState]] (inherently two-pass, series-sized state),
  * the CS estimator is a clean ONE-PASS fold: each bar pairs only with
  * its predecessor, and the per-ticker report is two decimal sums plus
  * a count — so the state is CONSTANT (previous bar's high/low + two
  * exact DECIMAL(38,18) accumulators of 1e-12-grid spread terms + the
  * pair count) at any stream length. Every per-pair double op runs in
  * the batch kernel's textual order; the accumulators are the same
  * shortest-repr decimal grid as the batch `dsum18(round(s, 12))`, so
  * stream and batch reports agree bit-for-bit. */
class CorwinSchultzProcessor
    extends StatefulProcessor[String, OhlcRow, CsRow] {

  // (prevHigh, prevLow, nPairs, sumRaw scale-18 string, sumFloored)
  @transient private var st:
    ValueState[(Double, Double, Long, String, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Double, Double, Long, String, String)](
      "cs_state", Encoders.kryo[(Double, Double, Long, String, String)],
      TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[OhlcRow],
      timerValues: TimerValues): Iterator[CsRow] = {
    var (ph, pl, n, rawS, flS) =
      if (st.exists()) st.get()
      else (Double.NaN, Double.NaN, 0L, "0", "0")
    var raw = new JBD(rawS)
    var fl = new JBD(flS)
    rows.toSeq.sortBy(_.window_timestamp.getTime).foreach { b =>
      if (!ph.isNaN && pl > 0.0 && b.low > 0.0) {
        val s = CorwinSchultzState.pairSpread(ph, pl, b.high, b.low)
        n += 1
        raw = raw.add(CorwinSchultzState.dec18(
          CorwinSchultzState.round12(s)))
        fl = fl.add(CorwinSchultzState.dec18(
          CorwinSchultzState.round12(math.max(s, 0.0))))
      }
      ph = b.high; pl = b.low
    }
    st.update((ph, pl, n, raw.toPlainString, fl.toPlainString))
    if (n == 0) Iterator.empty
    else Iterator.single(CsRow(key, n,
      MacdState.round6(raw.doubleValue / n),
      MacdState.round6(fl.doubleValue / n)))
  }
}

object CorwinSchultzState {

  private val K = 3.0 - 2.0 * math.sqrt(2.0)

  /** One bar pair's spread estimate — term-for-term the batch kernel's
    * textual order (hl1² + hl2², two-bar gamma, closed-form alpha,
    * logistic spread). */
  private[streaming] def pairSpread(ph: Double, pl: Double,
      high: Double, low: Double): Double = {
    val hl1 = math.log(ph / pl)
    val hl2 = math.log(high / low)
    val gl = math.log(math.max(ph, high) / math.min(pl, low))
    val beta = hl1 * hl1 + hl2 * hl2
    val gamma = gl * gl
    val alpha = (math.sqrt(2.0 * beta) - math.sqrt(beta)) / K -
      math.sqrt(gamma / K)
    2.0 * (math.exp(alpha) - 1) / (1.0 + math.exp(alpha))
  }

  private[streaming] def round12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** double → DECIMAL(38,18) through the shortest repr — the
    * engine-wide decimal-grid convention ([[CusumState.dec18]]). */
  private[streaming] def dec18(x: Double): JBD =
    new JBD(java.lang.Double.toString(x)).setScale(18, RoundingMode.HALF_UP)

  /** Attach the streaming CS estimator (stream or batch input; the
    * `close` field of [[OhlcRow]] is unused). */
  def attach(bars: Dataset[OhlcRow]): Dataset[CsRow] = {
    import bars.sparkSession.implicits._
    bars.groupByKey(_.ticker)
      .transformWithState(new CorwinSchultzProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
