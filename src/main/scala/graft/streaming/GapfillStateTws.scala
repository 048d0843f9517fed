package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap-fill on Spark 4's `transformWithState` successor API — the same
  * carry fold as [[GapfillState]] (shared code, so the two APIs cannot
  * drift), with the per-ticker carry in a typed `ValueState[GapCarry]`.
  * No timers: the spine's right edge is the newest real bar, so there
  * is never deferred output to flush (unlike sessionization, whose
  * final session needs an event-time timer).
  *
  * Streaming runs require the RocksDB state-store provider (as with
  * every transformWithState operator); parity with the batch dense-
  * spine query and with the flatMapGroupsWithState twin is
  * spec-asserted on real data. */
class GapfillProcessor extends StatefulProcessor[String, BarEvent, GapfillRow] {

  @transient private var carry: ValueState[GapCarry] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    carry = getHandle.getValueState[GapCarry]("gap_carry",
      Encoders.product[GapCarry], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[BarEvent],
      timerValues: TimerValues): Iterator[GapfillRow] = {
    val (next, out) = GapfillState.fold(
      if (carry.exists()) Some(carry.get()) else None, rows)
    next.foreach(carry.update)
    out.iterator
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[GapfillRow] =
    Iterator.empty
}

object GapfillStateTws {

  /** Attach gap-fill via transformWithState to a watermarked stream of
    * sparse bars. */
  def gapfill(bars: Dataset[BarEvent],
      delay: String = "0 seconds"): Dataset[GapfillRow] = {
    import bars.sparkSession.implicits._
    bars.withWatermark("bucket", delay)
      .groupByKey(_.ticker)
      .transformWithState(new GapfillProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
