package graft

import graft.operators.Multimodal
import graft.sources.Tables

/** Plumbing tests for the multimodal blob path: typed schema, batched
  * partition decode, partition-count invariance (the properties a real
  * codec swap must preserve). */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("blobs: binary payload with typed metadata, one row per document") {
    val b = Multimodal.blobs(docs)
    assert(b.count() === docs.count())
    val row = b.head()
    assert(row.content.nonEmpty && row.n_bytes === row.content.length.toLong)
    assert(Set("image", "audio", "video").contains(row.modality))
  }

  test("decode: deterministic fake yields fixed-width features, dims in range") {
    val d = Multimodal.decode(Multimodal.blobs(docs)).collect()
    assert(d.nonEmpty)
    d.foreach { m =>
      assert(m.feature.length === 16)
      assert(math.abs(m.feature.sum - 1.0) < 1e-9) // normalized histogram
      assert(m.width >= 64 && m.width < 128 && m.height >= 64 && m.height < 128)
    }
  }

  test("decode: output is invariant under repartitioning (batch-shape seam)") {
    val base = Multimodal.blobs(docs)
    val a = Multimodal.decode(base.repartition(1)).collect()
      .map(m => (m.id, m.width, m.height, m.n_frames, m.feature.toSeq)).sortBy(_._1)
    val b = Multimodal.decode(base.repartition(7)).collect()
      .map(m => (m.id, m.width, m.height, m.n_frames, m.feature.toSeq)).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("resize: fixed-length thumbs, deterministic nearest-neighbor sampling") {
    val r = Multimodal.resize(Multimodal.blobs(docs), n = 32).collect()
    assert(r.nonEmpty && r.forall(_.thumb.length === 32))
    // matches the column-expression twin used by the mm_resize oracle
    val viaExpr = Multimodal.resizeFeatures(docs).collect()
      .map(row => row.getAs[Long]("doc_id") -> row.getAs[String]("thumb_hex")).toMap
    r.foreach { m =>
      val hex = m.thumb.map(b => f"${b & 0xff}%02x").mkString
      assert(hex === viaExpr(m.id), s"doc ${m.id}")
    }
  }

  test("decode: video modality frame count scales with payload size") {
    val d = Multimodal.decode(Multimodal.blobs(docs))
      .filter(_.modality == "video").collect()
    assert(d.forall(m => m.n_frames >= 1))
    assert(d.exists(m => m.n_frames > 1)) // docs longer than 256 bytes exist
  }
}
