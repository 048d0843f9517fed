package graft

import org.apache.spark.sql.functions._

import graft.operators.{Enrichment, StockPipeline}
import graft.sources.Tables

/** The U1 batched-enrichment seam: per-partition batching actually
  * happens (call-count accounting), the 1:1 contract is enforced, and
  * the stubbed path is row-for-row identical to the inline normalize. */
class EnrichmentSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("normalizeBatched equals inline normalize row-for-row") {
    val inline = StockPipeline.normalize(Tables.events(spark, dir))
      .select("event_id", "ticker", "ts", "price", "volume",
        "ai_sentiment", "ai_summary")
      .orderBy("event_id").collect()
    val batched = Enrichment.normalizeBatched(Tables.events(spark, dir))
      .orderBy("event_id").collect()
    assert(inline.length === batched.length && inline.length > 0)
    inline.zip(batched).foreach { case (a, b) => assert(a === b) }
  }

  test("batch function is called once per batch, not once per row") {
    import spark.implicits._
    val calls = spark.sparkContext.longAccumulator("enrich_calls")
    val counting: Enrichment.BatchFn = batch => {
      calls.add(1)
      Enrichment.stubBatch(batch)
    }
    val ds = spark.range(100)
      .select(col("id").as("event_id"), lit("A").as("ticker"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"),
        lit(1.0).as("price"), lit(1L).as("volume"))
      .as[graft.operators.StockEvent]
      .repartition(4)
    // expected = sum over partitions of ceil(rows / batchSize)
    val sizes = ds.mapPartitions(it => Iterator(it.size)).collect()
    val expected = sizes.map(n => (n + 15) / 16).sum
    val out = Enrichment.enrich(ds, batchSize = 16, fn = counting)
    assert(out.count() === 100L)
    assert(calls.value === expected.toLong)
    assert(calls.value < 100L) // batching, not per-row calls
  }

  test("lossy batch function fails loudly (1:1 contract)") {
    import spark.implicits._
    val ds = Seq(
      graft.operators.StockEvent(1L, "A",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0, 1L),
      graft.operators.StockEvent(2L, "A",
        java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 2.0, 1L)).toDS()
    val lossy: Enrichment.BatchFn = batch => Enrichment.stubBatch(batch).tail
    val ex = intercept[Exception] {
      Enrichment.enrich(ds, batchSize = 8, fn = lossy).collect()
    }
    assert(ex.getMessage.contains("1:1") ||
      Option(ex.getCause).exists(_.getMessage.contains("1:1")))
  }
}
