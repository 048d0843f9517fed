package graft

import java.sql.Timestamp

import graft.operators.{StockPipeline, TimeSeries}
import graft.sources.Tables

/** The bucketed (scalable) tick-rule classifier must equal the
  * single-window global form row-for-row on ANY data shape — the
  * round-10 verdict named the global form (one task per ticker's
  * entire trade history) the roster's last single-task-per-key
  * ceiling. Checked on real data at two scales, two bucket widths
  * (including one small enough that real buckets are SPARSE — heads
  * whose previous price lives several buckets back), and a
  * deliberately bursty fixture with multi-day gaps, zero-tick runs
  * that SPAN empty buckets (the carry-side path), and a
  * leading-unclassified run (the all-NULL-bucket path). */
class TickRuleParitySpec extends SparkSpec {
  import spark.implicits._

  private def cols(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("ticker", "ts", "event_id").collect()

  private def assertParity(stock: org.apache.spark.sql.DataFrame,
      bucketSeconds: Long): Unit = {
    val global = cols(TimeSeries.tickSidesGlobal(stock))
    val bucketed = cols(TimeSeries.tickSidesBucketed(stock, bucketSeconds))
    assert(global.length === bucketed.length && global.nonEmpty)
    global.zip(bucketed).foreach { case (g, b) =>
      assert(g.toSeq === b.toSeq, s"global $g vs bucketed $b")
    }
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
       bucket <- Seq(86400L, 3600L)) {
    test(s"bucketed($bucket s) tick sides == global tick sides on $dir") {
      assertParity(StockPipeline.normalize(Tables.events(spark, dir)), bucket)
    }
  }

  test("bucketed tick sides == global on a bursty fixture: zero-tick " +
      "runs spanning empty buckets, multi-day gaps, leading NULL run") {
    // ticker A: price path with (a) a leading zero-tick run (never
    // classified until the first move), (b) an uptick, (c) a whole-day
    // burst of zero ticks whose side must carry from 2 days earlier,
    // (d) a downtick after another gap. One event per minute inside
    // bursts; bursts separated by 2-3 empty day-buckets.
    def t(day: Long, minute: Long) =
      new Timestamp((day * 86400L + minute * 60L) * 1000L)
    val rows = Seq(
      // day 0: leading zero-tick run — side stays NULL
      ("A", t(0, 0), 10.0, 5L, 1L), ("A", t(0, 1), 10.0, 5L, 2L),
      // day 0 later: first move — uptick
      ("A", t(0, 2), 11.0, 5L, 3L),
      // days 1-2 empty; day 3: all zero ticks — side carries +1 across
      // the gap (head row diffs against day 0's close, equal → carry)
      ("A", t(3, 0), 11.0, 7L, 4L), ("A", t(3, 1), 11.0, 7L, 5L),
      // day 6: downtick head row (11.0 → 9.5 across 2 empty days)
      ("A", t(6, 0), 9.5, 3L, 6L), ("A", t(6, 1), 9.5, 3L, 7L),
      // ticker B: single whole-history zero-tick stream — NULL forever
      ("B", t(0, 0), 4.0, 2L, 8L), ("B", t(4, 0), 4.0, 2L, 9L))
    val stock = rows
      .toDF("ticker", "ts", "price", "volume", "event_id")
    assertParity(stock, 86400L)
    // sanity on the fixture itself: the carry paths were exercised
    val sided = TimeSeries.tickSidesBucketed(stock, 86400L)
      .orderBy("event_id").collect()
    assert(sided.take(2).forall(_.isNullAt(4)), "leading run must be NULL")
    assert(sided(3).getInt(4) === 1 && sided(4).getInt(4) === 1,
      "day-3 zero ticks must inherit the +1 side across empty buckets")
    assert(sided(5).getInt(4) === -1, "day-6 head row must be a downtick")
    assert(sided.takeRight(2).forall(_.isNullAt(4)),
      "an all-zero-tick ticker stays unclassified")
  }
}
