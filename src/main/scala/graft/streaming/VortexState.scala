package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-bar Vortex emission — schema matches the batch
  * [[graft.operators.TimeSeries.vortexOhlc]] output. */
case class VortexRow(ticker: String, window_timestamp: Timestamp,
    vi_plus: Option[Double], vi_minus: Option[Double],
    vi_diff: Option[Double])

/** One per-bar (VM⁺, VM⁻, TR) term kept in Vortex state (`has =
  * false` = the first-bar NULL tier, still occupying a lag slot). */
case class VortexTerm(has: Boolean, vmp: Double, vmm: Double, tr: Double)

/** Streaming Vortex indicator on `transformWithState`: per ticker the
  * previous bar and the last [[graft.operators.TimeSeries.VortexSpan]]
  * (VM±, TR) terms live in a `ValueState` + `ListState` — the
  * [[AdxState]] level-1 recipe with cross-bar extremum distances
  * instead of directional moves, and no second chain tier.
  *
  * Bit-parity argument (spec-asserted): VM⁺ = |H − prev L| and
  * VM⁻ = |L − prev H| are single exact double ops; chains accumulate
  * in the batch textual order with literal 0.0 for missing/NULL-tier
  * lags; zero ΣTR → None for all three ratios via the same guard. */
class VortexProcessor
    extends StatefulProcessor[String, OhlcRow, VortexRow] {

  @transient private var terms: ListState[VortexTerm] = _
  @transient private var prev: ValueState[AdxPrevBar] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    terms = getHandle.getListState[VortexTerm]("vortex_terms",
      Encoders.product[VortexTerm], TTLConfig.NONE)
    prev = getHandle.getValueState[AdxPrevBar]("vortex_prev",
      Encoders.product[AdxPrevBar], TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[OhlcRow],
      timerValues: TimerValues): Iterator[VortexRow] = {
    import graft.operators.TimeSeries.VortexSpan
    var ts: List[VortexTerm] =
      if (terms.exists()) terms.get().toList else Nil
    var pb: Option[AdxPrevBar] =
      if (prev.exists()) Some(prev.get()) else None
    val out = rows.toSeq.sortBy(_.window_timestamp.getTime).map { r =>
      val term = pb match {
        case None => VortexTerm(has = false, 0.0, 0.0, 0.0)
        case Some(p) => VortexTerm(has = true,
          math.abs(r.high - p.low),
          math.abs(r.low - p.high),
          math.max(math.max(r.high - r.low, math.abs(r.high - p.close)),
            math.abs(r.low - p.close)))
      }
      ts = (term :: ts).take(VortexSpan)
      pb = Some(AdxPrevBar(r.high, r.low, r.close))
      val (sp, sm, st) = VortexState.chainFold(ts, VortexSpan)
      if (st == 0.0) VortexRow(key, r.window_timestamp, None, None, None)
      else VortexRow(key, r.window_timestamp,
        Some(MacdState.round6(sp / st)),
        Some(MacdState.round6(sm / st)),
        Some(MacdState.round6(sp / st - sm / st)))
    }
    terms.put(ts.toArray)
    pb.foreach(prev.update)
    out.iterator
  }
}

object VortexState {

  /** (ΣVM⁺, ΣVM⁻, ΣTR) over `xs` (NEWEST FIRST) in the batch chain's
    * textual term order. */
  private[streaming] def chainFold(xs: List[VortexTerm],
      span: Int): (Double, Double, Double) = {
    val arr = xs.toArray
    var sp = 0.0; var sm = 0.0; var st = 0.0
    var i = 0
    while (i < span) {
      if (i < arr.length && arr(i).has) {
        sp += arr(i).vmp; sm += arr(i).vmm; st += arr(i).tr
      } else {
        sp += 0.0; sm += 0.0; st += 0.0
      }
      i += 1
    }
    (sp, sm, st)
  }

  /** Attach streaming Vortex (stream or batch input). */
  def attach(bars: Dataset[OhlcRow]): Dataset[VortexRow] = {
    import bars.sparkSession.implicits._
    bars.groupByKey(_.ticker)
      .transformWithState(new VortexProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
