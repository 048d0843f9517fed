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

  test("phash: signature matches a per-row Scala reference (aHash " +
      "mean-threshold over the 64-point thumbnail)") {
    import org.apache.spark.sql.functions.col
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def ref(text: String): Seq[Long] = {
      val bytes = text.getBytes("UTF-8")
      val s = (0 until 64).map(i =>
        (bytes((i.toLong * bytes.length / 64).toInt) & 0xff).toLong)
      val sum = s.sum
      (0 until 4).map(b =>
        (0 until 16).map(j =>
          if (64 * s(16 * b + j) > sum) 1L << j else 0L).sum)
    }
    val got = Multimodal.phash(docs).collect()
    assert(got.length === texts.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val bands = (1 to 4).map(r.getLong)
      assert(bands === ref(texts(id)), s"doc $id")
      bands.foreach(b => assert(b >= 0L && b < 65536L, s"doc $id: 16-bit band"))
    }
  }

  test("phash runs unchanged on a stream (stateless map-side signature)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, length, lit}
    import spark.implicits._
    val rows = docs.select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 20).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows.nonEmpty, "fixture must select real docs (doc_id < 20)")
    val stream = MemoryStream[(Long, String)]
    val streamed = Multimodal.phash(stream.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        lit("en").as("lang"), lit("src0").as("source"),
        length(col("_2")).cast("long").as("n_chars")))
    val q = streamed.writeStream.format("memory")
      .queryName("phash_sink").outputMode("append").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("phash_sink").collect()
        .map(r => (r.getLong(0), (1 to 4).map(r.getLong))).toMap
      val batch = Multimodal.phash(docs.filter(col("doc_id") < 20)).collect()
        .map(r => (r.getLong(0), (1 to 4).map(r.getLong))).toMap
      assert(got === batch)
    } finally q.stop()
  }

  test("phash pairs: 8-band pigeonhole finds EVERY pair at hamming <= 7 " +
      "(complete vs brute force) and the join is banded, not all-pairs") {
    val sigs = Multimodal.phash(docs).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toArray)
    val brute = (for {
      (ida, pa) <- sigs; (idb, pb) <- sigs if ida < idb
      h = (0 until 4).map(b => java.lang.Long.bitCount(pa(b) ^ pb(b))).sum
      if h <= 7
    } yield (ida, idb, h.toLong)).toSet
    val got = Multimodal.phashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    // plan discipline: candidate generation is a band/key equi-join
    val plan = Multimodal.phashPairs(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("phashHammingHist: cumulative counts are monotone, the <= 7 " +
      "prefix equals the phashPairs count, and shares end at 1") {
    val hist = graft.operators.Multimodal.phashHammingHist(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(hist.nonEmpty)
    hist.map(_._3).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b); case _ => ()
    }
    assert(hist.last._4 === 1.0)
    hist.foreach { case (h, _, _, _, band) => assert(band === (h <= 7)) }
    val nPairs7 = graft.operators.Multimodal.phashPairs(docs).count()
    val cum7 = hist.filter(_._1 <= 7).lastOption.map(_._3).getOrElse(0L)
    assert(cum7 === nPairs7)
    assert(hist.map(_._2).sum === hist.last._3)
  }

  test("phashGroups: every doc grouped, paired docs share a group, " +
      "the group id is the component min") {
    val pairs = Multimodal.phashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val groups = Multimodal.phashGroups(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups.size === docs.count())
    pairs.foreach { case (a, b) =>
      assert(groups(a) === groups(b), s"pair ($a,$b) split across groups")
    }
    groups.foreach { case (id, g) => assert(g <= id) }
    // some group really merges distinct blobs (the fixture has dups)
    assert(groups.values.toSet.size < groups.size)
  }

  test("dhash: signature matches a per-row Scala reference (gradient " +
      "bits over the 65-point thumbnail)") {
    import org.apache.spark.sql.functions.col
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def ref(text: String): Seq[Long] = {
      val bytes = text.getBytes("UTF-8")
      val s = (0 to 64).map(i =>
        (bytes((i.toLong * bytes.length / 65).toInt) & 0xff).toLong)
      (0 until 4).map(b =>
        (0 until 16).map(j =>
          if (s(16 * b + j + 1) > s(16 * b + j)) 1L << j else 0L).sum)
    }
    val got = Multimodal.dhash(docs).collect()
    assert(got.length === texts.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val bands = (1 to 4).map(r.getLong)
      assert(bands === ref(texts(id)), s"doc $id")
    }
  }

  test("dhashAgreement: pair set equals phashPairs, dhamming matches " +
      "the dhash signatures, agree tracks the <= 7 bound") {
    val d = Multimodal.dhash(docs).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toArray).toMap
    val pp = Multimodal.phashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = Multimodal.dhashAgreement(docs).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      pp.keySet)
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === pp((a, b)), s"($a,$b) ahash hamming")
      val dh = (0 until 4)
        .map(i => java.lang.Long.bitCount(d(a)(i) ^ d(b)(i))).sum.toLong
      assert(r.getLong(3) === dh, s"($a,$b) dhamming")
      assert(r.getBoolean(4) === (dh <= 7L), s"($a,$b) agree")
    }
    // sf0.001 has exactly the aHash-coincidence pair (dhamming 35):
    // the panel's point is that dHash REFUTES it — a gradient
    // fingerprint catches the mean-threshold false positive
    assert(got.nonEmpty)
    assert(got.exists(!_.getBoolean(4)),
      "the known aHash false positive must fail dHash agreement")
  }

  test("resolutionHist: blob mass is conserved on the bounded grid, " +
      "bins stay in the 64..127 decode range, images are single-frame") {
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.operators.Multimodal.resolutionHist(d).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(3)).sum === d.count())
    out.foreach { r =>
      assert(r.getLong(1) >= 4L && r.getLong(1) <= 7L, s"w_bin: $r")
      assert(r.getLong(2) >= 4L && r.getLong(2) <= 7L, s"h_bin: $r")
      assert(r.getDouble(5) >= 1.0)
      if (r.getString(0) == "image")
        assert(r.getLong(4) === r.getLong(3), "images are 1 frame each")
    }
  }
}
