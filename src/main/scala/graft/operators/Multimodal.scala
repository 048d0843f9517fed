package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.Materialize.PinOps

/** A media blob row: opaque binary payload + typed metadata. In the
  * test data the payload is the document text's UTF-8 bytes (this
  * container ships no image/audio codecs); in production it is the
  * image/audio/video file bytes and `modality` tags the codec family. */
case class MediaBlob(id: Long, modality: String, source: String,
    n_bytes: Long, content: Array[Byte])

/** Decoded media: dimensions + a fixed-width feature vector (the shape a
  * CLIP-style embedder or mel-spectrogram stage would emit). */
case class DecodedMedia(id: Long, modality: String, width: Int, height: Int,
    n_frames: Int, feature: Array[Double])

/** Fixed-length downsampled payload ("thumbnail"). */
case class ResizedMedia(id: Long, modality: String, thumb: Array[Byte])

/** Multimodal-column operators: treat image/audio/video as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample plumbing runs as batched partition iterators.
  *
  * The DECODE STEP IS A DETERMINISTIC FAKE — clearly marked below. No
  * codec libraries exist in this container, so [[decodePartition]]
  * synthesizes dims/features from the payload bytes. Everything around
  * it — the binary schema, the `mapPartitions` batching (the Scala
  * analog of a Pandas UDF over `mapInPandas`: one iterator per
  * partition, amortizing per-batch model setup), the typed output
  * schema, partition-count invariance — is real and tested.
  *
  * Scale notes (100 TB): blobs dominate bytes, so the blob table is
  * stored with the binary column *last* and metadata columns first —
  * metadata-only queries ([[features]]) never touch blob pages thanks to
  * parquet column pruning. Decode is embarrassingly parallel map work;
  * partition sizing (`files.maxPartitionBytes`) bounds executor memory
  * since each task holds one partition's blobs at a time. */
object Multimodal {

  /** Build the blobs table from documents (payload = UTF-8 text bytes;
    * modality assigned deterministically for test coverage). */
  def blobs(documents: DataFrame): Dataset[MediaBlob] = {
    import documents.sparkSession.implicits._
    documents
      .select(
        col("doc_id").as("id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        col("source"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("text").cast("binary").as("content"))
      .as[MediaBlob]
  }

  /** FAKE DECODE — deterministic stand-in for the real codec call. A
    * production build replaces the body of this one function with e.g.
    * JavaCV/ffmpeg per-batch decoding; the signature (partition iterator
    * in, typed rows out) is the real seam.
    *
    * The fake is a mod-P rolling hash + byte histogram so the DuckDB
    * oracle can restate it exactly (`acc*31+x` stays < 2³⁶ under mod
    * 2³¹−1, so BIGINT arithmetic never overflows in either engine). */
  def decodePartition(it: Iterator[MediaBlob]): Iterator[DecodedMedia] =
    it.map { b =>
      val bytes = b.content
      val P = graft.functions.Portable.P31
      val h = bytes.foldLeft(17L)((acc, x) => (acc * 31 + (x & 0xff)) % P)
      val width = 64 + (h % 64).toInt
      val height = 64 + ((h / 64) % 64).toInt
      val nFrames = b.modality match {
        case "video" => (bytes.length / 256) + 1
        case "audio" => (bytes.length / 1024) + 1
        case _ => 1
      }
      // 16-bin byte histogram, normalized — the "extracted feature"
      val hist = new Array[Double](16)
      bytes.foreach(x => hist((x & 0xff) / 16) += 1.0)
      val n = math.max(bytes.length, 1).toDouble
      DecodedMedia(b.id, b.modality, width, height, nFrames,
        hist.map(_ / n))
    }

  /** Batched decode over partitions (Pandas-UDF-shaped seam). */
  def decode(ds: Dataset[MediaBlob]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(decodePartition)
  }

  /** Driver-comparable projection of [[decode]]: the feature vector
    * exploded to one (bin, value) row per histogram bin so every output
    * column is a sortable scalar (and the whole result is DuckDB-
    * expressible — see the `mm_decode` oracle). */
  def decodedRows(ds: Dataset[MediaBlob]): DataFrame =
    decode(ds).toDF()
      .select(col("id"), col("modality"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"),
        posexplode(col("feature")).as(Seq("bin", "value")))
      .select(col("id"), col("modality"), col("width"), col("height"),
        col("n_frames"), col("bin").cast("long").as("bin"), col("value"))
      .orderBy(col("id"), col("bin"))

  /** Resolution histogram of the decoded media: blob counts and mean
    * frame counts on the (modality, width÷16, height÷16) grid — the
    * shape census a multimodal training mix is balanced against
    * (resolution buckets decide resize targets and packing shapes).
    * Rides the [[decode]] seam; the grid is bounded (metadata-sized)
    * by construction, so the aggregate shuffles a handful of rows
    * whatever the corpus. avg frames is an exact-integer ratio. */
  def resolutionHist(documents: DataFrame): DataFrame = {
    decode(blobs(documents)).toDF()
      .groupBy(col("modality"),
        expr("CAST(width AS BIGINT) div 16").as("w_bin"),
        expr("CAST(height AS BIGINT) div 16").as("h_bin"))
      .agg(count(lit(1)).as("n_blobs"),
        sum(col("n_frames").cast("long")).as("n_frames"))
      .select(col("modality"), col("w_bin"), col("h_bin"), col("n_blobs"),
        col("n_frames"),
        round(col("n_frames") / col("n_blobs"), 6).as("avg_frames"))
      .orderBy(col("modality"), col("w_bin"), col("h_bin"))
  }

  /** Resized media: fixed-length nearest-neighbor downsample of the
    * payload (the byte-domain stand-in for image resizing). */
  def resizePartition(n: Int)(it: Iterator[MediaBlob]): Iterator[ResizedMedia] =
    it.map { b =>
      val src = b.content
      val thumb = Array.tabulate(n)(i =>
        if (src.isEmpty) 0.toByte
        else src((i.toLong * src.length / n).toInt))
      ResizedMedia(b.id, b.modality, thumb)
    }

  /** Batched resize over partitions (same seam shape as [[decode]]). */
  def resize(ds: Dataset[MediaBlob], n: Int = 32): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(resizePartition(n))
  }

  /** Frame sampling (video modality): up to `maxFrames` evenly-spaced
    * frames per video, each an 8-byte slice at offset f·len div n_frames
    * — the byte-domain stand-in for keyframe extraction (a real build
    * decodes at those timestamps through the [[decode]] seam). Exploded
    * to (id, frame_idx, frame_hex) scalar rows; oracle-expressible. */
  def sampleFrames(documents: DataFrame, maxFrames: Int = 4): DataFrame =
    documents
      .select(col("doc_id"), col("text"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .filter(col("modality") === "video")
      .withColumn("n_frames", (col("n_bytes") / 256).cast("long") + 1)
      .withColumn("frame_idx", explode(expr(
        s"sequence(0L, least(n_frames, ${maxFrames}L) - 1)")))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        lower(hex(expr("CAST(substring(text, " +
          "CAST(frame_idx * n_bytes div n_frames AS INT) + 1, 8) AS BINARY)")))
          .as("frame_hex"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Oracle-expressible resize: the same nearest-neighbor byte sampling
    * as pure column expressions (positions i·len div n, 0-based). */
  def resizeFeatures(documents: DataFrame, n: Int = 32): DataFrame =
    documents
      .select(col("doc_id"),
        lower(hex(concat_ws("", expr(
          s"transform(sequence(0, ${n - 1}), " +
            s"i -> substring(text, CAST(i * length(text) div $n AS INT) + 1, 1))"))
          .cast("binary"))).as("thumb_hex"))
      .orderBy(col("doc_id"))

  /** Average-hash perceptual fingerprint (aHash — the classic 8×8
    * grayscale mean-threshold image fingerprint) over the 64-point
    * nearest-neighbor thumbnail of the payload: bit i is set iff
    * sampled byte i exceeds the thumbnail mean. The mean compare is
    * stated integer-exactly (64·bᵢ > Σb — no float division on either
    * engine), and the 64 bits are emitted as four 16-bit band values
    * p0..p3; [[phashPairs]] slices them into eight 8-bit bands so the
    * [[graft.operators.Dedup.simhashPairs]] pigeonhole covers the wider
    * Hamming radius perceptual dedup needs — pairing stays a banded
    * equi-join, never all-pairs.
    *
    * In production the thumbnail comes from the real image decode
    * through the [[decode]] seam (resize → grayscale → 8×8); here the
    * byte-domain stand-in uses the same nearest-neighbor byte sampling
    * as [[resize]] (ASCII payloads, so `ascii` = byte value on both
    * engines).
    *
    * Scale: one map-side pass over the blobs — the signature is 4
    * longs per blob regardless of payload size, and all downstream
    * dedup work happens on signatures, never on payloads. */
  // generated FLAT scalar expressions (literal positions, CASE/+) —
  // higher-order array lambdas here are CodegenFallback and cost
  // ~ms/row interpreted; the flat form whole-stage-codegens to ~µs.
  // ssum lives in its own projection below the bands: it is
  // referenced 64× and non-cheap, so CollapseProject keeps the
  // boundary and it evaluates once per row.
  private def aSample(i: Int): String =
    s"CAST(ascii(substr(text, CAST($i * length(text) div 64 AS INT) + 1, " +
      s"1)) AS BIGINT)"
  private val aSsum = (0 until 64).map(aSample).mkString("(", " + ", ")")
  private def aBand(b: Int): String = (0 until 16).map { j =>
    s"(CASE WHEN 64 * ${aSample(16 * b + j)} > ssum " +
      s"THEN ${1L << j}L ELSE 0L END)"
  }.mkString("(", " + ", ")")

  def phash(documents: DataFrame): DataFrame =
    documents
      .withColumn("ssum", expr(aSsum))
      .select(col("doc_id") +: (0 until 4).map(b =>
        expr(aBand(b)).as(s"p$b")): _*)
    // no presentation sort: the op is stateless map-side (stream-safe —
    // signatures compute per-blob on a live ingest); the registered
    // query adds its ORDER BY

  /** Perceptual near-dup pairs at Hamming ≤ `maxHamming` over the
    * [[phash]] signature — the media-blob twin of SimHash text dedup:
    * banded equi-join on EIGHT 8-bit slices of the 64-bit hash
    * (pigeonhole-complete up to Hamming 7 — perceptual radii are wider
    * than text SimHash radii, so the banding trades bucket width for
    * recall radius; at larger corpus scale the production lever is a
    * LONGER hash (128/256-point thumbnail) at the same 8-bit slicing,
    * which restores bucket selectivity without shrinking the radius),
    * exact Hamming recheck on candidates only. */
  /** Media-dedup capstone: connected components over the perceptual-
    * hash near-dup pairs — every blob gets a group id (the component
    * min; untouched blobs group with themselves), the asset-level
    * "same image, many encodings" rollup. Composes [[phashPairs]] with
    * the size-adaptive CC operator, singletons restored by left join. */
  def phashGroups(documents: DataFrame, maxHamming: Int = 7): DataFrame = {
    val cc = graft.operators.Dedup.clustersBigStar(
      phashPairs(documents, maxHamming)
        .select(col("doc_a"), col("doc_b")))
      .select(col("doc_id"), col("cluster_id"))
    documents.select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("group_id"))
      .orderBy(col("doc_id"))
  }

  def phashPairs(documents: DataFrame, maxHamming: Int = 7): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"phashPairs: 8-band pigeonhole guarantees recall only for " +
        s"maxHamming <= 7, got $maxHamming")
    phashCandidates(documents, maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Band-collision candidate pairs with their full Hamming distance,
    * kept up to `maxHamming` (filter BEFORE distinct — shrink first).
    * Shared by [[phashPairs]] and [[phashHammingHist]]. */
  private[graft] def phashCandidates(documents: DataFrame,
      maxHamming: Int): DataFrame =
    // pin the signature table: the self-join references every band
    // expression on both sides (join keys + Hamming recheck), and
    // expression propagation through the join would otherwise re-derive
    // the 128-term signature per reference — measured 23.9 s → 0.7 s
    // at 500 docs on the unpinned form
    phashCandidatesFromSigs(phash(documents).pin(eager = true), maxHamming)

  /** [[phashCandidates]] over an ALREADY-PINNED (doc_id, p0..p3)
    * signature table — lets [[dhashAgreement]] derive both fingerprint
    * families from one shared payload scan. */
  private def phashCandidatesFromSigs(sigs: DataFrame,
      maxHamming: Int): DataFrame = {
    val pCols = (0 until 4).map(b => col(s"p$b"))
    val slices = (0 until 4).flatMap(b => Seq(
      (2 * b, col(s"p$b") % 256), (2 * b + 1, shiftright(col(s"p$b"), 8))))
    val banded = sigs.select(col("doc_id") +: pCols :+
        explode(array(slices.map { case (b, k) =>
          struct(lit(b).as("band"), k.as("key")) }: _*)).as("bb"): _*)
      .select(col("doc_id") +: pCols :+
        col("bb.band").as("band") :+ col("bb.key").as("key"): _*)
    banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (0 until 4).map(b => bit_count(expr(s"a.p$b ^ b.p$b")))
          .reduce(_ + _).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming) // before distinct: shrink first
      .distinct()
  }

  /** Hamming-distance histogram over the pHash band-collision
    * candidate set — the threshold-calibration panel for
    * [[phashPairs]]' `maxHamming` (the [[graft.operators.Dedup
    * .dfProfile]] sibling for media dedup): how many candidate pairs
    * sit at each distance, cumulative share, and whether the distance
    * is inside the pigeonhole-guaranteed recall band (≤ 7). Candidate
    * volume is band-bounded (never all-pairs); the histogram and its
    * cumulative window are 33 rows at most. */
  /** Difference-hash perceptual fingerprint (dHash — the gradient
    * sibling of [[phash]]): over a 65-point nearest-neighbor
    * thumbnail, bit i is set iff sample(i+1) > sample(i). Because it
    * thresholds ADJACENT-sample deltas instead of the global mean it
    * is invariant to uniform brightness shifts that flip aHash bits —
    * the standard second opinion in perceptual dedup stacks. Same
    * flat-codegen generation and 4×16-bit band layout as [[phash]];
    * integer comparisons only. */
  private def dSample(i: Int): String =
    s"CAST(ascii(substr(text, CAST($i * length(text) div 65 AS INT)" +
      s" + 1, 1)) AS BIGINT)"
  private def dBand(b: Int): String = (0 until 16).map { j =>
    val i = 16 * b + j
    s"(CASE WHEN ${dSample(i + 1)} > ${dSample(i)} " +
      s"THEN ${1L << j}L ELSE 0L END)"
  }.mkString("(", " + ", ")")

  def dhash(documents: DataFrame): DataFrame =
    documents.select(col("doc_id") +: (0 until 4).map(b =>
      expr(dBand(b)).as(s"d$b")): _*)

  /** Cross-fingerprint agreement panel: every [[phashPairs]] candidate
    * (aHash Hamming ≤ `maxHamming`) re-scored under [[dhash]] — a pair
    * two INDEPENDENT fingerprints call near-identical is a
    * high-confidence duplicate, one only aHash flags is a
    * brightness-shift suspect for review. The dedup-confidence tiering
    * every production perceptual pipeline runs before destructive
    * collapse.
    *
    * Scale: the pair set is the banded candidate output (never
    * all-pairs); the dHash rescore is two equi-joins against the
    * 4-long signature table, payloads untouched. */
  def dhashAgreement(documents: DataFrame,
      maxHamming: Int = 7): DataFrame = {
    // ONE payload scan builds BOTH fingerprint families (aHash p0..p3
    // AND dHash d0..d3 in a single pinned projection — the two builds
    // used to each sample the payload separately); every downstream
    // reference (the banded self-join sides, both rescore joins) is a
    // projection over the pinned 8-long signature table, payloads
    // untouched after this point
    val sigs = documents
      .withColumn("ssum", expr(aSsum))
      .select(col("doc_id") +:
        ((0 until 4).map(b => expr(aBand(b)).as(s"p$b")) ++
         (0 until 4).map(b => expr(dBand(b)).as(s"d$b"))): _*)
      .pin(eager = true)
    val dhamming = (0 until 4).map(b =>
      bit_count(expr(s"a$b ^ b$b"))).reduce(_ + _).cast("long")
    val d = sigs.select(col("doc_id") +: (0 until 4).map(c => col(s"d$c")): _*)
    phashCandidatesFromSigs(
        sigs.select(col("doc_id") +: (0 until 4).map(c => col(s"p$c")): _*),
        maxHamming)
      .join(d.select(col("doc_id").as("doc_a") +:
        (0 until 4).map(b => col(s"d$b").as(s"a$b")): _*), Seq("doc_a"))
      .join(d.select(col("doc_id").as("doc_b") +:
        (0 until 4).map(b => col(s"d$b").as(s"b$b")): _*), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("hamming"),
        dhamming.as("dhamming"),
        (dhamming <= maxHamming).as("agree"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def phashHammingHist(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Fingerprint-multiplicity compression (round 12): the histogram's
    // wide ≤32 radius makes the DOC-grain candidate front quadratic in
    // copy multiplicity — at sf10's ~100-copy shape the distinct pair
    // shuffle passed 70 GB and outgrew the bench host. Docs with the
    // same 64-bit signature contribute identically, so the histogram
    // is computed on the DISTINCT-signature table with multiplicities:
    // a band-colliding signature pair (s_a ≠ s_b) at Hamming h
    // contributes m_a·m_b pairs, and each signature with m > 1
    // contributes C(m,2) pairs at Hamming 0 (identical signatures
    // always band-collide; distinct signatures can never sit at
    // Hamming 0, so the two terms partition the pair set). The
    // candidate front shrinks from |docs|² to |signatures|²-bounded —
    // the same banding, two decades smaller. HammingHistSpec proves
    // the compressed form row-identical to the doc-grain statement;
    // the oracle states the same compression over the documents table.
    val sigs = phash(documents)
      .groupBy((0 until 4).map(b => col(s"p$b")): _*)
      .agg(count(lit(1)).cast("long").as("m"),
        min(col("doc_id")).as("doc_id"))
      .pin(eager = true)
    val cross = phashCandidatesWeighted(sigs)
      .filter(col("hamming") <= 32)
      .groupBy(col("hamming")).agg(sum(col("weight")).as("n_pairs"))
    val within = sigs.filter(col("m") > 1)
      .agg(coalesce(sum(col("m") * (col("m") - 1) / 2), lit(0L))
        .cast("long").as("n_pairs"))
      .select(lit(0L).as("hamming"), col("n_pairs"))
      .filter(col("n_pairs") > 0)
    val hist = cross.unionByName(within)
      .groupBy(col("hamming")).agg(sum(col("n_pairs")).as("n_pairs"))
    val tot = hist.agg(sum(col("n_pairs")).as("n_total"))
    val w = Window.orderBy(col("hamming"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.crossJoin(broadcast(tot))
      .select(col("hamming"), col("n_pairs"),
        sum(col("n_pairs")).over(w).as("cum_pairs"),
        round(sum(col("n_pairs")).over(w).cast("double") /
          col("n_total"), 6).as("cum_share"),
        (col("hamming") <= 7).as("in_recall_band"))
      .orderBy(col("hamming"))
  }

  /** Band-collision pairs over a pinned DISTINCT-signature table
    * carrying multiplicities: (doc_id key, p0..p3, m). Emits one row
    * per colliding signature pair with its Hamming distance and the
    * m_a·m_b doc-pair weight. The [[phashCandidatesFromSigs]] banding
    * with the pair weight threaded through the distinct. */
  private def phashCandidatesWeighted(sigs: DataFrame): DataFrame = {
    val pCols = (0 until 4).map(b => col(s"p$b"))
    val slices = (0 until 4).flatMap(b => Seq(
      (2 * b, col(s"p$b") % 256), (2 * b + 1, shiftright(col(s"p$b"), 8))))
    val banded = sigs.select(col("doc_id") +: col("m") +: pCols :+
        explode(array(slices.map { case (b, k) =>
          struct(lit(b).as("band"), k.as("key")) }: _*)).as("bb"): _*)
      .select(col("doc_id") +: col("m") +: pCols :+
        col("bb.band").as("band") :+ col("bb.key").as("key"): _*)
    banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (0 until 4).map(b => bit_count(expr(s"a.p$b ^ b.p$b")))
          .reduce(_ + _).cast("long").as("hamming"),
        (col("a.m") * col("b.m")).cast("long").as("weight"))
      .distinct()
  }

  /** Metadata/byte-level features as pure column expressions (oracle-
    * expressible, never reads beyond the first bytes of the payload):
    * blob length, 8-byte header hex, an 8-point stride-16 byte sample. */
  def features(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        lower(hex(substring(col("text").cast("binary"), 1, 8)))
          .as("header_hex"),
        lower(hex(concat_ws("", expr(
          "transform(sequence(0, 7), i -> substring(text, 1 + i * 16, 1))"))
          .cast("binary"))).as("stride_sample_hex"))
      .orderBy(col("doc_id"))

  /** Audio-landmark parameters — shared with the oracle generator.
    * 32-byte frames (the STFT-frame stand-in over the byte-domain
    * payload), landmark pairs capped at an 8-frame fan-out gap. */
  val AlFrameBytes = 32
  val AlMaxGap = 8L
  val AlSalt = "graft-al:"

  /** Shazam-style constellation fingerprint census per source: frame
    * the payload into [[AlFrameBytes]]-byte blocks, take each frame's
    * integer energy (byte sum — the spectral-peak stand-in; a real
    * deployment swaps in FFT peaks through the [[decode]] seam and
    * changes NOTHING downstream), keep strict local maxima as peaks,
    * pair each peak with its next peak within [[AlMaxGap]] frames, and
    * hash (energy₁ mod 256, energy₂ mod 256, Δframes) into the
    * landmark key — the anchor–target combinatorial hash of
    * Wang 2003. The census reports landmark volume and key
    * discriminability (distinct/total — a collapsing key space makes
    * retrieval un-indexable), the health check before building the
    * inverted landmark index.
    *
    * Determinism: integer energies, integer compares (peak rule:
    * > previous, ≥ next, boundary frames compare against −1), salted
    * 32-bit landmark hash — no floats until the final share. Scale:
    * frames are one map-side explode (O(payload bytes), the
    * [[graft.operators.Dedup.cdcChunks]] grain); peaks/landmarks are
    * per-doc lag windows over frame rows (PARTITIONED — bounded by
    * payload length); the census is one hash aggregate. */
  def audioLandmarks(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = AlFrameBytes
    val frames = documents
      .filter(length(col("text")) >= n)
      .select(col("source"), col("doc_id"), posexplode(expr(
        s"transform(sequence(0, length(text) div $n - 1), " +
          s"j -> substr(text, j * $n + 1, $n))")).as(Seq("j", "fr")))
      .select(col("source"), col("doc_id"), col("j").cast("long").as("j"),
        expr(s"aggregate(transform(sequence(1, $n), " +
          s"p -> CAST(ascii(substr(fr, p, 1)) AS BIGINT)), " +
          s"CAST(0 AS BIGINT), (a, x) -> a + x)").as("energy"))
      .pin()
    val fw = Window.partitionBy(col("doc_id")).orderBy(col("j"))
    val peaks = frames
      .withColumn("pe", coalesce(lag(col("energy"), 1).over(fw), lit(-1L)))
      .withColumn("ne", coalesce(lead(col("energy"), 1).over(fw), lit(-1L)))
      .filter(col("energy") > col("pe") && col("energy") >= col("ne"))
      .select(col("source"), col("doc_id"), col("j"), col("energy"))
    val lm = peaks
      .withColumn("j2", lead(col("j"), 1).over(fw))
      .withColumn("e2", lead(col("energy"), 1).over(fw))
      .filter(col("j2").isNotNull && col("j2") - col("j") <= AlMaxGap)
      .select(col("source"), col("doc_id"),
        graft.functions.Portable.hash32(concat(lit(AlSalt),
          pmod(col("energy"), lit(256L)).cast("string"), lit(":"),
          pmod(col("e2"), lit(256L)).cast("string"), lit(":"),
          (col("j2") - col("j")).cast("string"))).as("lm_key"))
    val fcount = frames.groupBy(col("source"))
      .agg(count(lit(1)).as("n_frames"))
    val pcount = peaks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_peaks"))
    val lcount = lm.groupBy(col("source"))
      .agg(count(lit(1)).as("n_landmarks"),
        countDistinct(col("lm_key")).as("n_distinct_keys"))
    fcount
      .join(pcount, Seq("source"), "left")
      .join(lcount, Seq("source"), "left")
      .select(col("source"), col("n_frames"),
        coalesce(col("n_peaks"), lit(0L)).as("n_peaks"),
        coalesce(col("n_landmarks"), lit(0L)).as("n_landmarks"),
        coalesce(col("n_distinct_keys"), lit(0L)).as("n_distinct_keys"),
        when(col("n_landmarks") > 0,
          round(col("n_distinct_keys").cast("double") /
            col("n_landmarks"), 6)).as("key_discriminability"))
      .orderBy(col("source"))
  }
}
