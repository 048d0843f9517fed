package graft.streaming

import java.math.{BigDecimal => JBD, RoundingMode}
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One 5-minute close bar on the stream (the
  * [[graft.operators.TimeSeries]] `closeBars5m` grain the CUSUM kernel
  * reads). */
case class CusumBar(ticker: String, bucket: Timestamp, close: Double)

/** Per-trigger CUSUM report emission — schema matches the batch
  * `cusumBars` output row. The newest (highest `n_rets`) emission per
  * ticker supersedes older ones — the [[ResRow]] supersede
  * convention, because a change-point REPORT over a growing series is
  * a summary, not a per-row indicator. */
case class CusumRow(ticker: String, n_rets: Long, break_bucket: Timestamp,
    cusum_max: Double, cusum_stat: Option[Double])

/** Streaming CUSUM change-point screen on `transformWithState` — the
  * twin of the batch `cusumBars` kernel
  * (`operators/TimeSeries.scala`), bit-identical across any trigger
  * split (spec-asserted).
  *
  * Unlike the bounded-lag indicator twins ([[MacdState]],
  * [[AtrState]], [[StochState]]), CUSUM is inherently TWO-PASS: every
  * excursion term is (rᵢ − μ) under the FINAL mean μ, and the batch
  * kernel rounds each term double→DECIMAL(38,18) individually — so S_t
  * cannot be folded online as P_t − t·μ (the per-term rounding depends
  * on μ). The state is therefore the per-ticker RETURN SERIES itself
  * (one (bucket, r) pair per 5-minute bar — bar-grain, never
  * event-grain), and each trigger REPLAYS the batch kernel over it:
  *   - r = close/prev − 1 (double, prev ≠ 0 guard) at ingest — the
  *     `simpleRets` expression;
  *   - μ and σ from exact DECIMAL(38,18) power sums of the identical
  *     doubles (Σ dec18(r), Σ dec18(r·r)), divided as doubles in the
  *     batch textual order;
  *   - S_t = running exact-decimal sum of dec18(r_t − μ), max|S| by
  *     decimal compare, break bucket = FIRST attaining bucket (exact
  *     decimal equality — the batch tie rule);
  *   - the two output stats in the batch rounding order (cast→round6,
  *     NULL on σ = 0).
  * Production sizing: a per-ticker day holds 288 bars, so state is KB
  * per key; an unbounded-horizon deployment would window the screen
  * (per-session/day CUSUM) or age the list with a TTL — the replay
  * cost per trigger is O(bars so far), which is exactly the batch
  * kernel's own cost over the same prefix. */
class CusumProcessor extends StatefulProcessor[String, CusumBar, CusumRow] {

  @transient private var series: ListState[(Long, Double)] = _
  @transient private var prevClose: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    series = getHandle.getListState[(Long, Double)]("cusum_series",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)
    prevClose = getHandle.getValueState[Double]("cusum_prev_close",
      Encoders.scalaDouble, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[CusumBar],
      timerValues: TimerValues): Iterator[CusumRow] = {
    var ser: List[(Long, Double)] =
      if (series.exists()) series.get().toList else Nil
    var pc: Option[Double] =
      if (prevClose.exists()) Some(prevClose.get()) else None
    rows.toSeq.sortBy(_.bucket.getTime).foreach { b =>
      pc match {
        // simpleRets: when(prev =!= 0.0, close/prev − 1), NULLs dropped
        case Some(p) if p != 0.0 =>
          ser = (b.bucket.getTime, b.close / p - 1.0) :: ser
        case _ => ()
      }
      pc = Some(b.close)
    }
    series.put(ser.toArray)
    pc.foreach(prevClose.update)
    if (ser.isEmpty) Iterator.empty
    else Iterator.single(CusumState.report(key, ser.reverse))
  }
}

object CusumState {

  /** double → DECIMAL(38,18): Spark casts through the SHORTEST decimal
    * repr of the double (`Double.toString`), then HALF_UP to scale 18 —
    * the engine-wide decimal-grid convention. */
  private[streaming] def dec18(x: Double): JBD =
    new JBD(java.lang.Double.toString(x)).setScale(18, RoundingMode.HALF_UP)

  /** The batch `cusumBars` kernel replayed over one ticker's return
    * series (bucket-ascending), term-for-term in the batch textual
    * order. */
  private[streaming] def report(ticker: String,
      rets: Seq[(Long, Double)]): CusumRow = {
    val n = rets.length
    val nd = n.toDouble
    var s1 = JBD.ZERO
    var s2 = JBD.ZERO
    rets.foreach { case (_, r) =>
      s1 = s1.add(dec18(r)); s2 = s2.add(dec18(r * r))
    }
    // mean = s1 / nd (decimal→double crossing, then double division)
    val mu = s1.doubleValue / nd
    val sd = math.sqrt(math.max(s2.doubleValue / nd - mu * mu, 0.0))
    // S_t = exact-decimal running sum of dec18(r − μ); max|S| with the
    // FIRST-bucket tie rule (exact decimal equality, as the batch)
    var s = JBD.ZERO
    var sMax = JBD.ZERO.subtract(JBD.ONE) // any |S| ≥ 0 beats it
    var breakBucket = 0L
    rets.foreach { case (bucket, r) =>
      s = s.add(dec18(r - mu))
      val sAbs = s.abs
      if (sAbs.compareTo(sMax) > 0) { sMax = sAbs; breakBucket = bucket }
    }
    val sm = sMax.doubleValue
    val stat =
      if (sd > 0.0) Some(MacdState.round6(sm / (sd * math.sqrt(nd))))
      else None
    CusumRow(ticker, n.toLong, new Timestamp(breakBucket),
      MacdState.round6(sm), stat)
  }

  /** Attach the streaming CUSUM screen (stream or batch input). */
  def attach(bars: Dataset[CusumBar]): Dataset[CusumRow] = {
    import bars.sparkSession.implicits._
    bars.groupByKey(_.ticker)
      .transformWithState(new CusumProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
