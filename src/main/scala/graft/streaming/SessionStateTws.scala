package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Sessionization on Spark 4's `transformWithState` successor API — the
  * same fold as [[SessionState]] (shared code, so the two APIs cannot
  * drift), with the open session in a typed `ValueState[OpenSession]`
  * and the final-session flush on a FIRST-CLASS event-time timer
  * instead of `GroupStateTimeout`: the processor arms exactly one
  * timer per key at the session's flush point, re-arming (delete +
  * register) whenever a new event extends the session — the timer
  * lifecycle `flatMapGroupsWithState` hides inside its single implicit
  * timeout, made explicit.
  *
  * Streaming runs require the RocksDB state-store provider (as with
  * every transformWithState operator); parity with the batch
  * `session_window` query and with the flatMapGroupsWithState twin is
  * spec-asserted on real data. */
class SessionProcessor extends StatefulProcessor[Long, SessionEvent, SessionRow] {

  @transient private var open: ValueState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[OpenSession]("open_session",
      Encoders.product[OpenSession], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
      timerValues: TimerValues): Iterator[SessionRow] = {
    val (next, closed) = SessionState.fold(
      if (open.exists()) Some(open.get()) else None, rows)
    next.foreach { s =>
      // one live timer per key: drop the stale flush point, arm the new.
      // Materialize before deleting — mutating timer state under the
      // live listTimers() iterator is undefined on providers that back
      // the iterator directly.
      getHandle.listTimers().toList.foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(SessionState.flushAtMs(s,
        timerValues.getCurrentWatermarkInMs()))
      open.update(s)
    }
    closed.map(SessionState.toRow(key, _)).iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionRow] = {
    // input rows are handled before timers in a trigger, and any event
    // extending the session re-armed a LATER timer — so an expiry here
    // always means the open session is final
    if (open.exists()) {
      val out = Iterator.single(SessionState.toRow(key, open.get()))
      open.clear()
      out
    } else Iterator.empty
  }
}

object SessionStateTws {

  /** Attach sessionization via transformWithState to a watermarked
    * stream of events. */
  def sessionize(events: Dataset[SessionEvent],
      delay: String = "0 seconds"): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
