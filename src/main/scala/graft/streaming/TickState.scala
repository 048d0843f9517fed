package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One normalized tick on the stream (the
  * [[graft.operators.StockPipeline.normalize]] columns the tick-rule
  * classifier reads). */
case class TickEventRow(ticker: String, ts: Timestamp, price: Double,
    volume: Long, event_id: Long)

/** Per-event classification — schema matches the batch
  * [[graft.operators.TimeSeries.tickSides]] intermediate. */
case class TickSideRow(ticker: String, ts: Timestamp, event_id: Long,
    volume: Long, side: Option[Int])

/** The tick-rule carry: the previous price and the last resolved
  * side (`hasSide = false` while the leading run is unclassified). */
case class TickCarry(prevPrice: Double, hasPrev: Boolean,
    side: Int, hasSide: Boolean)

/** Streaming tick-rule trade classification on `transformWithState`:
  * per ticker ONE `ValueState` carries the previous price and the
  * last resolved side — O(1) state per key, the leanest twin state
  * yet — and each arriving event is classified exactly as the batch
  * `last(tick, ignoreNulls)` carry does: uptick → +1, downtick → −1,
  * zero tick inherits, the leading run stays None. This is the
  * canonical ingest-side enrichment: the classification column lands
  * on the stream BEFORE bar aggregation, so the OFI bars are one
  * windowed aggregate downstream.
  *
  * Exact-parity argument (spec-asserted): classification is pure
  * integer decisions on exact double comparisons — no float
  * accumulation anywhere — so stream and batch agree identically;
  * within a trigger, rows sort by the same (ts, event_id) total
  * order the batch window states. */
class TickProcessor
    extends StatefulProcessor[String, TickEventRow, TickSideRow] {

  @transient private var carry: ValueState[TickCarry] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    carry = getHandle.getValueState[TickCarry]("tick_carry",
      Encoders.product[TickCarry], TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[TickEventRow],
      timerValues: TimerValues): Iterator[TickSideRow] = {
    var c: TickCarry =
      if (carry.exists()) carry.get()
      else TickCarry(0.0, hasPrev = false, 0, hasSide = false)
    val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id)).map { r =>
      val tick: Option[Int] =
        if (!c.hasPrev) None
        else if (r.price > c.prevPrice) Some(1)
        else if (r.price < c.prevPrice) Some(-1)
        else None
      val side: Option[Int] = tick.orElse(
        if (c.hasSide) Some(c.side) else None)
      c = TickCarry(r.price, hasPrev = true,
        side.getOrElse(0), side.isDefined)
      TickSideRow(key, r.ts, r.event_id, r.volume, side)
    }
    carry.update(c)
    out.iterator
  }
}

object TickState {

  /** Attach streaming tick classification (stream or batch input). */
  def attach(events: Dataset[TickEventRow]): Dataset[TickSideRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.ticker)
      .transformWithState(new TickProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
