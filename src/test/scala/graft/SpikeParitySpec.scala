package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.StockPipeline
import graft.sources.Tables

/** The bucketed (scalable) spike form must equal the global-window
  * form on ANY data shape — the round-10 exact carry (globally-last 10
  * preceding rows into every non-empty bucket) removed the old
  * ≥10-rows-per-bucket density precondition, which MakeScale's bursty
  * sf1 copies violated (37 flipped booleans, caught by the sf1 oracle
  * sweep). Checked on real data at two scales (including the sparse
  * sf0.001 that the OLD form genuinely diverged on), two bucket
  * widths, and a deliberately gappy fixture whose 10-preceding frame
  * spans several sparse buckets. */
class SpikeParitySpec extends SparkSpec {
  import spark.implicits._

  private def cols(df: org.apache.spark.sql.DataFrame) =
    df.select("ticker", "window_timestamp", "hist_avg_volume", "is_volume_spike")
      .orderBy("ticker", "window_timestamp")

  private def assertParity(joined: org.apache.spark.sql.DataFrame,
      bucket: Int): Unit = {
    val global = cols(StockPipeline.withSpike(joined)).collect()
    val bucketed = cols(StockPipeline.withSpikeBucketed(joined, bucket)).collect()
    assert(global.length === bucketed.length)
    global.zip(bucketed).foreach { case (g, b) => assert(g === b) }
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
       bucket <- Seq(1440, 2880)) {
    test(s"bucketed($bucket min) spike == global spike on $dir") {
      assertParity(StockPipeline.joined(
        StockPipeline.normalize(Tables.events(spark, dir))), bucket)
    }
  }

  test("bucketed spike == global spike on a bursty fixture whose " +
      "frame spans several sparse buckets (the sf1 failure class)") {
    // bursts of 1-4 minute rows separated by multi-day gaps: every
    // burst's frame reaches across 2+ empty-or-sparse buckets
    val rows = Seq.tabulate(8) { burst =>
      val base = burst.toLong * 3L * 86400L // a burst every 3 days
      (0 until (burst % 4) + 1).map { i =>
        ("A", new Timestamp((base + 60L * i) * 1000L),
          100L + 7L * burst + i, 10.0)
      }
    }.flatten
    val joined = rows
      .toDF("ticker", "window_timestamp", "total_volume_1m", "sma_5m")
    assertParity(joined, 1440)
  }
}
