package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One normalized stock event before enrichment. */
case class StockEvent(event_id: Long, ticker: String, ts: Timestamp,
    price: Double, volume: Long)

/** The event with its LLM enrichment attached. */
case class EnrichedEvent(event_id: Long, ticker: String, ts: Timestamp,
    price: Double, volume: Long, ai_sentiment: Double, ai_summary: String)

/** U1 batched-enrichment seam (reference behavior:
  * `stock-ingestion-function/main.py:104-149` — one LLM RPC per event
  * BATCH, not per event). Same shape as [[Multimodal.decode]]: a
  * partition iterator is re-chunked into fixed-size batches and the
  * batch function is invoked once per chunk, amortizing per-call RPC /
  * model-session setup. The default batch function is the engine's
  * deterministic zero-egress stub (identical arithmetic to
  * [[StockPipeline.sentimentOf]]/[[StockPipeline.summaryOf]], so the
  * DuckDB oracle verifies the whole path); a production build swaps in
  * a real HTTP/SDK call without touching the plumbing.
  *
  * Scale notes (100 TB): embarrassingly parallel map work — no shuffle,
  * no state; `batchSize` bounds the per-call payload and the only
  * per-task memory above the iterator is one batch. Failure containment
  * and retries belong inside the batch function (as in the reference). */
object Enrichment {

  type BatchFn = Seq[StockEvent] => Seq[EnrichedEvent]

  /** Deterministic stub — the zero-egress twin of the reference's LLM
    * call, one invocation per batch. */
  val stubBatch: BatchFn = batch => batch.map { e =>
    val m = e.event_id % 21 - 10
    EnrichedEvent(e.event_id, e.ticker, e.ts, e.price, e.volume,
      m / 10.0, s"${e.ticker} momentum $m")
  }

  /** Partition iterator → batched calls (the seam itself). Enforces the
    * 1:1 contract so a lossy batch function fails loudly, not silently. */
  def enrichPartition(batchSize: Int, fn: BatchFn)(
      it: Iterator[StockEvent]): Iterator[EnrichedEvent] =
    it.grouped(batchSize).flatMap { batch =>
      val out = fn(batch)
      require(out.length == batch.length,
        s"enrich batchFn must be 1:1 (${batch.length} in, ${out.length} out)")
      out
    }

  /** Batched enrichment over partitions. */
  def enrich(ds: Dataset[StockEvent], batchSize: Int = 64,
      fn: BatchFn = stubBatch): Dataset[EnrichedEvent] = {
    require(batchSize > 0, s"enrich: batchSize must be positive, got $batchSize")
    import ds.sparkSession.implicits._
    ds.mapPartitions(enrichPartition(batchSize, fn))
  }

  /** The full P1..P6+U1 normalize path with enrichment routed through
    * the batched seam instead of inline column expressions — output is
    * row-for-row identical to [[StockPipeline.normalize]] (spec-asserted
    * and oracle-verified via the `stock_enrich_batched` query). */
  def normalizeBatched(events: DataFrame, batchSize: Int = 64,
      fn: BatchFn = stubBatch): DataFrame = {
    import events.sparkSession.implicits._
    val base = events
      .select(
        col("event_id"),
        col("event_type").as("ticker"),
        col("ts"),
        col("value").cast("double").as("price"),
        // same try_cast semantics as StockPipeline.normalize
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("volume"))
      .filter(col("price").isNotNull && !isnan(col("price")) &&
        col("volume").isNotNull)
      .as[StockEvent]
    enrich(base, batchSize, fn).toDF()
  }
}
