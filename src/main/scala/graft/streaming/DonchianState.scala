package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Per-bar Donchian emission — schema matches the batch
  * [[graft.operators.TimeSeries.donchianOhlc]] output. */
case class DonchianRow(ticker: String, window_timestamp: Timestamp,
    close: Double, dc_up: Double, dc_dn: Double, dc_mid: Double)

/** One (high, low) bar extreme pair kept in Donchian state. */
case class HlPair(high: Double, low: Double)

/** Streaming Donchian channel on `transformWithState`: per ticker the
  * last [[graft.operators.TimeSeries.DonchianSpan]] (high, low) pairs
  * live in one `ListState` — CONSTANT state per key — and each
  * arriving bar emits the same trailing highest-high / lowest-low
  * channel as the batch `greatest`/`least` lag-chain kernel.
  *
  * Bit-parity argument (spec-asserted): max/min over a bounded set of
  * exact stored doubles is ORDER-INSENSITIVE (prices are never NaN —
  * the normalize gate drops them), so no textual-order fold is needed;
  * the midpoint divides the raw (unrounded) extremes by 2.0 exactly as
  * the batch `(dcu + dcd) / 2.0`; the leading edge needs no special
  * case — lag 0 is the current bar on both sides, so the extreme set
  * is never empty. */
class DonchianProcessor
    extends StatefulProcessor[String, OhlcRow, DonchianRow] {

  @transient private var hls: ListState[HlPair] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    hls = getHandle.getListState[HlPair]("donchian_hl",
      Encoders.product[HlPair], TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[OhlcRow],
      timerValues: TimerValues): Iterator[DonchianRow] = {
    import graft.operators.TimeSeries.DonchianSpan
    var hs: List[HlPair] = if (hls.exists()) hls.get().toList else Nil
    val out = rows.toSeq.sortBy(_.window_timestamp.getTime).map { r =>
      hs = (HlPair(r.high, r.low) :: hs).take(DonchianSpan)
      val up = hs.iterator.map(_.high).max
      val dn = hs.iterator.map(_.low).min
      DonchianRow(key, r.window_timestamp, r.close,
        MacdState.round6(up), MacdState.round6(dn),
        MacdState.round6((up + dn) / 2.0))
    }
    hls.put(hs.toArray)
    out.iterator
  }
}

object DonchianState {

  /** Attach streaming Donchian (stream or batch input). */
  def attach(bars: Dataset[OhlcRow]): Dataset[DonchianRow] = {
    import bars.sparkSession.implicits._
    bars.groupByKey(_.ticker)
      .transformWithState(new DonchianProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
