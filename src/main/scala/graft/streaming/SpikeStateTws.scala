package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** ST1 on Spark 4's `transformWithState` successor API — the same spike
  * transition as [[SpikeState]] (last ≤10 one-minute volumes per ticker,
  * strict `> 2×mean` excluding the current element), with the history in
  * a typed `ListState[Long]` instead of a `GroupState[List[Long]]` blob.
  *
  * Why this twin exists: `flatMapGroupsWithState` serializes the whole
  * state object per key per trigger; `ListState` gives the state store
  * element-grade access (append without rewriting the list) plus
  * first-class TTL/timers — the API Spark 4 points new stateful
  * pipelines at. Parity with the batch window-frame form (and therefore
  * with the flatMapGroupsWithState twin) is spec-asserted.
  *
  * State-store note: streaming `transformWithState` requires the RocksDB
  * state-store provider (`spark.sql.streaming.stateStore.providerClass`);
  * batch execution of the same operator needs no store. */
class SpikeProcessor extends StatefulProcessor[String, VolumeRow, SpikeRow] {

  @transient private var hist: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    hist = getHandle.getListState[Long]("volume_history",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[VolumeRow],
      timerValues: TimerValues): Iterator[SpikeRow] = {
    var h: List[Long] = if (hist.exists()) hist.get().toList else Nil
    val out = rows.toSeq.sortBy(_.window_timestamp.getTime).map { r =>
      val avg = if (h.isEmpty) 0.0 else h.sum.toDouble / h.size
      val spike = r.total_volume_1m > 2.0 * avg && avg > 0.0
      h = (h :+ r.total_volume_1m).takeRight(10)
      SpikeRow(key, r.window_timestamp, r.total_volume_1m, avg, spike)
    }
    hist.put(h.toArray)
    out.iterator
  }
}

object SpikeStateTws {

  /** Attach spike detection via transformWithState (stream or batch). */
  def detect(rows: Dataset[VolumeRow]): Dataset[SpikeRow] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.ticker)
      .transformWithState(new SpikeProcessor, TimeMode.None(), OutputMode.Append())
  }
}
