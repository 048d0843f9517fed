package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

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
}
