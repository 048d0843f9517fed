package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One 5-minute close bar on the stream. */
case class BarRow(ticker: String, bucket: Timestamp, close: Double)

/** Per-bar MACD emission — schema matches the batch
  * [[graft.operators.TimeSeries.macdBars]] output. */
case class MacdRow(ticker: String, bucket: Timestamp, close: Double,
    macd: Double, macd_signal: Double, macd_hist: Double)

/** Streaming MACD on `transformWithState`: per ticker, the last
  * [[graft.operators.TimeSeries.MacdSlow]] closes and the last
  * [[graft.operators.TimeSeries.MacdSignal]] raw MACD values live in
  * two `ListState`s — CONSTANT state per key regardless of stream
  * length — and each arriving bar emits the same truncated-EWMA
  * fast/slow/signal values as the batch lag-chain kernels.
  *
  * Bit-parity argument (spec-asserted): [[MacdState.ewmaFold]]
  * accumulates `x·w` products and weights in the SAME left-to-right
  * term order as the batch `reduce(_ + _)` Column chain — identical
  * JVM double operations in identical order — and missing lags
  * contribute the same literal 0.0, so stream and batch agree to the
  * bit, rounding and signed-zero guard included. */
class MacdProcessor extends StatefulProcessor[String, BarRow, MacdRow] {

  @transient private var closes: ListState[Double] = _
  @transient private var macds: ListState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    closes = getHandle.getListState[Double]("macd_closes",
      Encoders.scalaDouble, TTLConfig.NONE)
    macds = getHandle.getListState[Double]("macd_raws",
      Encoders.scalaDouble, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[BarRow],
      timerValues: TimerValues): Iterator[MacdRow] = {
    import graft.operators.TimeSeries.{MacdFast, MacdSignal, MacdSlow}
    var cs: List[Double] = if (closes.exists()) closes.get().toList else Nil
    var ms: List[Double] = if (macds.exists()) macds.get().toList else Nil
    val out = rows.toSeq.sortBy(_.bucket.getTime).map { r =>
      cs = (r.close :: cs).take(MacdSlow)
      val raw = MacdState.ewmaFold(cs, MacdFast) -
        MacdState.ewmaFold(cs, MacdSlow)
      ms = (raw :: ms).take(MacdSignal)
      val sig = MacdState.ewmaFold(ms, MacdSignal)
      MacdRow(key, r.bucket, r.close,
        MacdState.z(MacdState.round6(raw)),
        MacdState.z(MacdState.round6(sig)),
        MacdState.z(MacdState.round6(raw - sig)))
    }
    closes.put(cs.toArray)
    macds.put(ms.toArray)
    out.iterator
  }
}

object MacdState {

  /** Truncated-EWMA over `xs` (NEWEST FIRST): num/den accumulated in
    * the batch kernel's textual term order (i = 0 .. span−1), so the
    * float sums are bit-identical to the codegen'd lag-chain. */
  private[streaming] def ewmaFold(xs: List[Double], span: Int): Double = {
    val decay = 1.0 - 2.0 / (span + 1)
    var num = 0.0
    var den = 0.0
    var i = 0
    val arr = xs.toArray
    while (i < span) {
      if (i < arr.length) {
        val w = math.pow(decay, i)
        num += arr(i) * w
        den += w
      } else {
        num += 0.0
        den += 0.0
      }
      i += 1
    }
    num / den
  }

  /** Spark `round(x, 6)` twin: unsigned-BigDecimal HALF_UP. */
  private[streaming] def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The batch signed-zero guard: map −0.0 to +0.0. */
  private[streaming] def z(x: Double): Double = if (x == 0.0) 0.0 else x

  /** Attach streaming MACD (stream or batch input). */
  def attach(bars: Dataset[BarRow]): Dataset[MacdRow] = {
    import bars.sparkSession.implicits._
    bars.groupByKey(_.ticker)
      .transformWithState(new MacdProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
