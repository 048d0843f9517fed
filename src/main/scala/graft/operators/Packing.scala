package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.Materialize.PinOps

/** Corpus-assembly operators — the step after curation in an LLM data
  * pipeline: turn the kept documents into the artifacts training jobs
  * consume (fixed-token chunks, token-budget pack assignment, a
  * deterministic global shuffle order, and train/val/test splits).
  *
  * The global-order operators ([[packAssign]], [[shuffleOrder]]) need a
  * prefix scan over a total order — the textbook single-partition-window
  * scale-killer. Both instead use a two-level scan: order-preserving
  * range buckets, per-bucket partials (a `buckets`-row aggregate —
  * metadata, not data), an exclusive prefix over that tiny table, and a
  * within-bucket window keyed by bucket. Every data-sized stage is
  * partition-parallel; the only unpartitioned window runs over
  * `buckets` rows.
  */
object Packing {

  val chunkTokens = 64
  val overlapStride = 40
  val eodToken = "<|eod|>"
  val packBudget = 2048
  val nBuckets = 32
  val shuffleSalt = "graft-shuffle:"
  val splitSalt = "graft-split:"
  val zorderBits = 4 // bits per Z-order dimension (shared with oracle)

  private def toks: Column = Portable.tokens(col("text"))

  /** Bucket ladder for [[lengthBuckets]] — shared with the oracle.
    * Hand-chosen thresholds (the usual inference-serving practice), so
    * bucket assignment is integer comparisons — no float log2 whose
    * rounding could diverge between engines at exact powers of two. */
  val bucketSizes: Seq[Int] = Seq(16, 32, 64, 128, 256)

  /** Length-bucketing report — the dynamic-batching layout for
    * inference/training serving: each document pads to the smallest
    * bucket that fits it (docs over the ladder clamp to the top), and
    * the report prices the padding waste per bucket (the number every
    * batching-strategy decision starts from). One map-side bucket
    * assignment + one hash aggregation on ≤|ladder| keys. */
  def lengthBuckets(documents: DataFrame): DataFrame = {
    val n = size(toks).cast("long")
    val bucket = bucketSizes.reverse.tail.foldLeft(
      lit(bucketSizes.last.toLong): Column) { (e, b) =>
      when(n <= b, lit(b.toLong)).otherwise(e)
    }
    documents
      .select(col("doc_id"), n.as("n_tokens"), bucket.as("bucket"))
      .withColumn("pad", greatest(col("bucket") - col("n_tokens"), lit(0L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("pad")).as("total_padding"))
      .select(col("bucket"), col("n_docs"), col("total_tokens"),
        col("total_padding"),
        round(col("total_padding").cast("double") /
          (col("bucket") * col("n_docs")), 6).as("pad_frac"))
      .orderBy(col("bucket"))
  }

  /** Split each document into fixed-size token chunks (context-window
    * shards). Pure map-side explode — embarrassingly parallel. */
  def chunk(documents: DataFrame, chunkSize: Int = chunkTokens): DataFrame =
    documents
      .withColumn("tk", toks)
      .withColumn("n", size(col("tk")).cast("long"))
      .withColumn("chunk_id",
        explode(sequence(lit(0L), expr(s"(n + ${chunkSize - 1}) div $chunkSize") - 1)))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(chunkSize.toLong), col("n") - col("chunk_id") * chunkSize)
          .as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("tk"), (col("chunk_id") * chunkSize + 1).cast("int"),
            lit(chunkSize))).as("chunk_text"))
      // stream-safe (stateless explode): registration adds the ORDER BY

  /** Chunk-grain exact dedup census: fingerprint every [[chunk]] with
    * the portable 64-bit hash, keep-first-by-(doc_id, chunk_id), and
    * report per doc how many of its chunks are duplicates of earlier
    * material — the sub-document dedup signal (boilerplate headers,
    * repeated license blocks) that document-level exact dedup cannot
    * see and near-dup banding only catches when MOST of the doc
    * matches. Output: per doc, chunk counts, duplicated-chunk count
    * and share, and how many of those duplicate EARLIER docs (vs
    * within-doc repeats).
    *
    * Scale: fingerprint-before-shuffle (chunks never move as text —
    * only 2×64-bit hashes shuffle), one hash aggregate to the
    * fingerprint grain, one doc-grain rollup. */
  def chunkDedup(documents: DataFrame,
      chunkSize: Int = chunkTokens): DataFrame = {
    val fp = chunk(documents, chunkSize)
      .select(col("doc_id"), col("chunk_id"),
        graft.functions.Portable.hash32(col("chunk_text")).as("h_lo"),
        graft.functions.Portable.hash32Hi(col("chunk_text")).as("h_hi"))
    // keep-first key as one BIGINT: chunk_id < 2^20 by construction
    // (chunkTokens-sized chunks of bounded docs), so the composite is
    // the (doc_id, chunk_id) lexicographic min on both engines
    val first = fp.groupBy(col("h_lo"), col("h_hi"))
      .agg(min(col("doc_id") * lit(1048576L) + col("chunk_id")).as("k"))
      .select(col("h_lo"), col("h_hi"),
        expr("k div 1048576").as("first_doc"),
        (col("k") % 1048576L).as("first_chunk"))
    fp.join(first, Seq("h_lo", "h_hi"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("doc_id") =!= col("first_doc") ||
            col("chunk_id") =!= col("first_chunk"), 1L).otherwise(0L))
          .as("n_dup_chunks"),
        sum(when(col("doc_id") =!= col("first_doc"), 1L).otherwise(0L))
          .as("n_cross_doc_dups"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        col("n_cross_doc_dups"),
        round(col("n_dup_chunks").cast("double") /
          col("n_chunks").cast("double"), 6).as("dup_share"))
      .orderBy(col("doc_id"))
  }

  /** Sliding-window chunking with overlap (stride < chunkSize):
    * consecutive chunks share `chunkSize − stride` tokens — the
    * RAG/context-window layout, vs [[chunk]]'s disjoint shards. Window
    * count per doc is ceil(max(n − size, 0) / stride) + 1: every token
    * is covered and the final window is the first to reach the document
    * end (truncated, never empty). Stateless per-doc explode —
    * stream-safe, zero shuffles; output volume is a fixed
    * size/stride multiple of the input, never quadratic. */
  def chunkOverlap(documents: DataFrame, chunkSize: Int = chunkTokens,
      stride: Int = overlapStride): DataFrame =
    documents
      .withColumn("tk", toks)
      .withColumn("n", size(col("tk")).cast("long"))
      .filter(col("n") > 0)
      .withColumn("chunk_id", explode(sequence(lit(0L),
        expr(s"(greatest(n - $chunkSize, 0) + ${stride - 1}) div $stride"))))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(chunkSize.toLong), col("n") - col("chunk_id") * stride)
          .as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("tk"), (col("chunk_id") * stride + 1).cast("int"),
            lit(chunkSize))).as("chunk_text"))

  /** Exclusive prefix offsets over per-bucket partials. `partials` must
    * be metadata-sized (one row per bucket): the unpartitioned window
    * here is the deliberate, bounded exception. */
  private[operators] def exclusivePrefix(partials: DataFrame,
      valueCol: String): DataFrame =
    partials.withColumn("offset",
      coalesce(sum(col(valueCol)).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))

  /** Token-budget pack assignment: documents in doc_id order fill
    * training packs of `budget` tokens each (the streaming-concat
    * packing every pretraining tokenizer job does). `pack_id` is the
    * bin the document STARTS in: floor(exclusive-cumsum / budget).
    *
    * cum_tokens is the inclusive running token total — computed with
    * the two-level scan (range buckets over doc_id → per-bucket sums →
    * broadcast offsets → within-bucket window), not a global window. */
  def packAssign(documents: DataFrame, budget: Int = packBudget,
      buckets: Int = nBuckets): DataFrame =
    packAssignBy(documents, size(toks).cast("long"), budget, buckets)

  /** [[packAssign]] budgeting in BPE-style subwords
    * ([[graft.functions.BpeExprs.bpeCount]] — greedy longest-match over
    * the fixed merge table) instead of whitespace tokens: the count a
    * real tokenizer-fed training job packs by. Same two-level scan;
    * only the per-document cost column changes. */
  def packAssignBpe(documents: DataFrame, budget: Int = packBudget,
      buckets: Int = nBuckets): DataFrame =
    packAssignBy(documents, graft.functions.BpeExprs.bpeCount(col("text")),
      budget, buckets)

  private def packAssignBy(documents: DataFrame, tokenCount: Column,
      budget: Int, buckets: Int): DataFrame = {
    // checkpoint the 2-long-per-doc projection: the offsets branch, the
    // bounds scan and the window branch then share one tokenization
    // pass instead of re-splitting the full corpus per branch
    val t = documents.select(col("doc_id"), tokenCount.as("n_tokens"))
      .pin()
    val bounds = t.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    val b = t.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        expr(s"((doc_id - lo) * $buckets) div (hi - lo + 1)"))
      .drop("lo", "hi")
    val offsets = exclusivePrefix(
      b.groupBy(col("bucket")).agg(sum(col("n_tokens")).as("part")), "part")
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    b.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_tokens", col("offset") + sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"),
        expr(s"(cum_tokens - n_tokens) div $budget").as("pack_id"))
      .orderBy(col("doc_id"))
  }

  /** Physical sequence packing — the packed training rows themselves.
    * [[packAssign]] gives each document its pack id through the
    * two-level scan; here each pack becomes ONE row: its documents
    * concatenated in doc_id order with an end-of-document separator
    * token (what the tokenizer job feeds the trainer). Per-pack state
    * is bounded by the token budget, so the in-group ordered assembly
    * (array_sort over collected (doc_id, text) structs — collect_list
    * alone has no cross-partition order) is O(budget) per group, and
    * the groupBy shuffles on the high-cardinality, evenly-filled
    * pack_id. */
  def packSequences(documents: DataFrame, budget: Int = packBudget,
      sep: String = eodToken): DataFrame =
    packAssign(documents, budget)
      .join(documents.select(col("doc_id"), col("text")), Seq("doc_id"))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        concat_ws(s" $sep ", transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          s => s.getField("text"))).as("sequence_text"))
      .orderBy(col("pack_id"))

  /** Deterministic global shuffle order for training: rank by a salted
    * content-independent hash (same permutation every run, any cluster,
    * any partition layout). The hash is uniform on [0, 2^32), so range
    * buckets are static — no sampling pass; rank = broadcast bucket
    * offset + within-bucket row_number.
    *
    * If the input carries a `copy_id` column ([[Curation.sampleMixture]]
    * upsampling), it is folded into the hash and the tiebreak, so the
    * copies of one document scatter across the permutation instead of
    * landing adjacent, and the rank stays a deterministic total order.
    * The tiny keyed projection is checkpointed so the hash is computed
    * once, not once per scan branch. */
  def shuffleOrder(documents: DataFrame, buckets: Int = nBuckets): DataFrame = {
    val step = 4294967296L / buckets
    val hasCopies = documents.columns.contains("copy_id")
    val hashInput =
      if (hasCopies)
        concat(lit(shuffleSalt), col("doc_id").cast("string"),
          lit(":"), col("copy_id").cast("string"))
      else concat(lit(shuffleSalt), col("doc_id").cast("string"))
    val idCols =
      if (hasCopies) Seq(col("doc_id"), col("copy_id")) else Seq(col("doc_id"))
    val keyed = documents.select(
        (idCols :+ Portable.hash32(hashInput).as("shuffle_key")): _*)
      .withColumn("bucket", expr(s"shuffle_key div $step"))
      .pin()
    val offsets = exclusivePrefix(
      keyed.groupBy(col("bucket")).agg(count(lit(1)).as("part")), "part")
    val w = Window.partitionBy(col("bucket"))
      .orderBy((col("shuffle_key") +: idCols): _*)
    keyed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("ord", col("offset") + row_number().over(w).cast("long"))
      .select((idCols :+ col("shuffle_key") :+ col("ord")): _*)
      .orderBy(col("ord"))
  }

  /** Packing-efficiency report over [[packAssign]]'s layout: per pack,
    * the document count, token fill, and utilization against the
    * budget — the wasted-compute metric a training job watches (every
    * unfilled token is a padded position on the accelerator). Output
    * is pack-count-sized; one hash aggregate over the assignment. */
  def packEfficiency(documents: DataFrame,
      budget: Int = packBudget): DataFrame =
    packAssign(documents, budget)
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("fill_tokens"))
      .select(col("pack_id"), col("n_docs"), col("fill_tokens"),
        round(col("fill_tokens").cast("double") / budget, 6)
          .as("utilization"))
      .orderBy(col("pack_id"))

  /** Per-pack attention accounting: when packed sequences train WITHOUT
    * cross-document attention masking, only the within-document share
    * of the pack's token-pair mass is useful signal — `within_share` =
    * Σnᵢ² / (Σnᵢ)² per pack (1.0 = a single document fills the pack,
    * → 1/n_docs as the pack fragments), and `cross_share` is the
    * contamination a masking implementation would eliminate. The
    * measurement that decides whether sequence packing needs block-
    * diagonal attention at a given corpus length profile.
    *
    * Determinism: token counts are exact integers; Σn² stays in BIGINT
    * (n ≤ budget, so n² ≤ budget² per term) and the single closing
    * ratio is long/long double division. Scale: rides [[packAssign]]
    * (the two-level scan) plus one hash aggregate on the evenly-filled
    * pack grain. */
  def attentionMass(documents: DataFrame,
      budget: Int = packBudget): DataFrame =
    packAssign(documents, budget)
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_tokens") * col("n_tokens")).as("s2"))
      .select(col("pack_id"), col("n_docs"), col("n_tokens"), {
        // NULL divisor: an all-empty pack must yield NULL, not an ANSI
        // divide-by-zero (CSE can hoist the shared division out of a
        // when() guard)
        val t2 = when(col("n_tokens") > 0,
          col("n_tokens") * col("n_tokens"))
        round(col("s2") / t2, 6).as("within_share")
      }, {
        val t2 = when(col("n_tokens") > 0,
          col("n_tokens") * col("n_tokens"))
        round(lit(1.0) - col("s2") / t2, 6).as("cross_share")
      })
      .orderBy(col("pack_id"))

  /** Documents per training shard for [[shardAssign]]. */
  val shardDocs = 64L

  /** Per-split deterministic shard assignment: each document gets its
    * split (salted-hash 90/5/5), its position in the split's shuffled
    * training order, and the shard that position lands in
    * ([[shardDocs]] consecutive positions per shard) — the
    * WebDataset/TFRecord sharding contract, computed as plain columns
    * so the sink ([[graft.sources.Sinks.writeTrainingShards]]) is a
    * pure partitioned write.
    *
    * Same two-level scan as [[shuffleOrder]], with every data-sized
    * stage keyed by (split, bucket): per-key counts → per-split
    * broadcast exclusive prefix over the static hash-range buckets →
    * within-bucket row_number. A window partitioned by `split` alone
    * would be a 3-task ceiling at any scale; this never builds one
    * (the only split-partitioned window runs on the metadata-sized
    * bucket counts). */
  def shardAssign(documents: DataFrame, shardSize: Long = shardDocs,
      buckets: Int = nBuckets): DataFrame = {
    val step = 4294967296L / buckets
    val keyed = splitAssign(documents)
      .select(col("doc_id"), col("split"),
        Portable.hash32(concat(lit(shuffleSalt), col("doc_id").cast("string")))
          .as("shuffle_key"))
      .withColumn("bucket", expr(s"shuffle_key div $step"))
      .pin()
    val offsets = keyed.groupBy(col("split"), col("bucket"))
      .agg(count(lit(1)).as("part"))
      .withColumn("offset",
        coalesce(sum(col("part")).over(
          Window.partitionBy(col("split")).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("split"), col("bucket"), col("offset"))
    val w = Window.partitionBy(col("split"), col("bucket"))
      .orderBy(col("shuffle_key"), col("doc_id"))
    keyed.join(broadcast(offsets), Seq("split", "bucket"))
      .withColumn("split_ord", col("offset") + row_number().over(w).cast("long"))
      .withColumn("shard_id", expr(s"(split_ord - 1) div $shardSize"))
      .select("doc_id", "split", "shuffle_key", "split_ord", "shard_id")
      .orderBy(col("split"), col("split_ord"))
  }

  /** Per-shard zone-map manifest over [[shardAssign]]'s layout: for
    * every (split, shard) the document count, doc_id min/max, total
    * characters, and an order-insensitive content checksum (the
    * [[graft.operators.Curation.corpusChecksum]] bit_xor mechanics,
    * scoped per shard). This is the data-skipping + integrity sidecar a
    * lakehouse writes next to each shard: a reader prunes shards on the
    * id range / size stats without opening them, and verifies a
    * delivered shard against its checksum without trusting row order.
    * One join of the id-only shard layout to the (doc_id, text,
    * n_chars) projection, one hash aggregate — output is
    * O(#shards), metadata-sized at any corpus scale. */
  def shardStats(documents: DataFrame, shardSize: Long = shardDocs,
      buckets: Int = nBuckets): DataFrame = {
    val layout = shardAssign(documents, shardSize, buckets)
      .select(col("doc_id"), col("split"), col("shard_id"))
    val content = documents.select(col("doc_id"),
      graft.functions.Portable.hash32(
        TextAnalysis.normalizedText(col("text"))).as("h"),
      col("n_chars"))
    layout.join(content, Seq("doc_id"))
      .groupBy(col("split"), col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        sum(col("n_chars")).as("total_chars"),
        bit_xor(col("h")).as("content_xor"))
      .orderBy(col("split"), col("shard_id"))
  }

  /** The 90/5/5 salted split bucket of a key column — THE split
    * formula: shared by the per-doc [[splitAssign]] and the
    * cluster-atomic [[graft.operators.Curation.splitLeakFree]] (which
    * hashes the cluster representative), so salt and thresholds cannot
    * drift between them (their singleton-agreement property depends on
    * it). */
  private[operators] def splitBucketOf(key: Column): Column =
    pmod(Portable.hash32(concat(lit(splitSalt), key.cast("string"))),
      lit(100L))

  private[operators] def splitOf(bucket: Column): Column =
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")

  /** Deterministic train/val/test split (90/5/5) by salted hash —
    * map-side, reproducible, independent of the sampling salt so
    * subsampling and splitting don't correlate. */
  def splitAssign(documents: DataFrame): DataFrame =
    documents
      .withColumn("split_bucket", splitBucketOf(col("doc_id")))
      .withColumn("split", splitOf(col("split_bucket")))
      // stream-safe (stateless map-side): registration adds the ORDER BY
      .select("doc_id", "lang", "source", "split_bucket", "split")

  /** Z-order (Morton-curve) layout rank — the multi-dimensional
    * clustering key behind `OPTIMIZE ZORDER BY` in lakehouse table
    * formats: interleaving the bits of two bounded dimension buckets
    * places rows close in BOTH dimensions into the same file, so a
    * scan predicate on EITHER dimension prunes most files (a single-
    * column sort can only serve one predicate). Dimensions here:
    * x = equal-width `n_chars` band (the priceHistogram formula over a
    * broadcast min/max — monotone, so band order is length order),
    * y = source ordinal mod 2^bits.
    *
    * The global rank is the two-level scan with the z-value ITSELF as
    * the band (bounded: 2^(2·bits) values), so no window ever spans
    * more than one z-cell; writing the corpus in `zrank` order is the
    * layout step. Pure integer bit arithmetic end-to-end — the oracle
    * restates it digit-for-digit. */
  def zorderLayout(documents: DataFrame, bits: Int = zorderBits): DataFrame = {
    val dims = 1L << bits
    val bounds = documents.agg(min(col("n_chars")).as("lo"),
      max(col("n_chars")).as("hi"))
    val xy = documents.select(col("doc_id"), col("n_chars"), col("source"))
      .crossJoin(broadcast(bounds))
      .withColumn("xb",
        when(col("hi") === col("lo"), lit(0L)).otherwise(least(
          expr(s"((n_chars - lo) * $dims) div (hi - lo + 1)"),
          lit(dims - 1))))
      .withColumn("yb", expr(s"CAST(substr(source, 4) AS BIGINT) % $dims"))
      .select("doc_id", "xb", "yb")
    val z = (0 until bits).map { i =>
      shiftright(col("xb"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(col("yb"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
    val zd = xy.withColumn("z", z.cast("long"))
    val offsets = exclusivePrefix(
      zd.groupBy(col("z").as("bucket")).agg(count(lit(1)).as("part")), "part")
    val w = Window.partitionBy(col("z")).orderBy(col("doc_id"))
    zd.join(broadcast(offsets), zd("z") === offsets("bucket"))
      .withColumn("zrank",
        (col("offset") + row_number().over(w) - 1).cast("long"))
      .select("doc_id", "xb", "yb", "z", "zrank")
      .orderBy(col("zrank"))
  }

  /** T5 span-corruption plan parameters — shared with the oracle
    * generator: 15% noise density, mean span length 3 (Raffel et al.
    * 2020's defaults). Stated in exact integer arithmetic:
    * corrupted = (n·15) div 100, spans = max(1, corrupted div 3). */
  val CorruptNoiseNumer = 15L
  val CorruptNoiseDenom = 100L
  val CorruptMeanSpan = 3L

  /** Span-corruption budget plan (T5 denoising objective): per doc,
    * how many tokens the 15%/mean-3 recipe corrupts, how many spans
    * (= sentinel tokens) that creates, and the resulting encoder/
    * decoder sequence lengths — input = kept tokens + one sentinel per
    * span, target = corrupted tokens + sentinels (+1 final sentinel).
    * The source rollup gives the numbers a pretraining-data plan needs
    * BEFORE tokenizing anything: total encoder/decoder token volume
    * and the overhead ratio vs raw tokens.
    *
    * Determinism: pure integer arithmetic per doc off the token count;
    * the two ratio columns are exact-integer divisions rounded once.
    * Scale: one map-side projection + one source-grain hash
    * aggregate. */
  def spanCorruptionPlan(documents: DataFrame): DataFrame = {
    val nTok = size(toks).cast("long")
    val perDoc = documents
      .select(col("source"), col("doc_id"), nTok.as("n_tokens"))
      .withColumn("n_corrupted",
        expr(s"(n_tokens * $CorruptNoiseNumer) div $CorruptNoiseDenom"))
      .withColumn("n_spans",
        when(col("n_corrupted") > 0,
          greatest(expr(s"n_corrupted div $CorruptMeanSpan"), lit(1L)))
          .otherwise(lit(0L)))
      .withColumn("input_len",
        col("n_tokens") - col("n_corrupted") + col("n_spans"))
      .withColumn("target_len",
        col("n_corrupted") + col("n_spans") + lit(1L))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("raw_tokens"),
        sum(col("n_corrupted")).as("corrupted_tokens"),
        sum(col("n_spans")).as("n_spans"),
        sum(col("input_len")).as("encoder_tokens"),
        sum(col("target_len")).as("decoder_tokens"))
      .select(col("source"), col("n_docs"), col("raw_tokens"),
        col("corrupted_tokens"), col("n_spans"), col("encoder_tokens"),
        col("decoder_tokens"),
        round(col("corrupted_tokens").cast("double") /
          when(col("raw_tokens") > 0, col("raw_tokens")), 6)
          .as("realized_noise_density"),
        round((col("encoder_tokens") + col("decoder_tokens"))
          .cast("double") / when(col("raw_tokens") > 0, col("raw_tokens")),
          6).as("token_overhead"))
      .orderBy(col("source"))
  }
}
