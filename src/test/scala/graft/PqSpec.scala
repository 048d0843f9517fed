package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Product-quantization invariants: codes are complete and in range,
  * identical vectors quantize to identical codes (so ADC scores them
  * identically), and the whole path is partition-layout independent. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def emb = graft.sources.Tables.embeddings(spark, dir)

  test("pqBuild: every vector gets one code per subspace, in [0, k)") {
    val (codes, cents) = Similarity.pqBuild(emb)
    val n = emb.count()
    assert(codes.count() === n)
    (0 until Similarity.pqM).foreach { s =>
      val bad = codes.filter(col(s"c$s") < 0 || col(s"c$s") >= Similarity.kmK)
        .count()
      assert(bad === 0, s"subspace $s has out-of-range codes")
      assert(cents.filter(col("sub") === s).count() === Similarity.kmK.toLong)
    }
  }

  test("pqDistortion: one row per subspace covering every vector, " +
      "MSE matches a direct recomputation from codes + codebooks, " +
      "explained fraction in (0, 1]") {
    val out = Similarity.pqDistortion(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(4))).toMap
    val n = emb.count()
    assert(out.keySet === (0 until Similarity.pqM).map(_.toLong).toSet)
    out.values.foreach { case (nv, mse, ex) =>
      assert(nv === n)
      assert(mse >= 0.0)
      assert(ex > 0.0 && ex <= 1.0, "codes must explain some variance")
    }
    // direct recomputation for subspace 0 on the same grid
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e")).collect()
      .map { r =>
        val e = r.getSeq[Double](1).toArray
        val norm = math.sqrt(e.map(x => x * x).sum)
        r.getLong(0) -> e.map(_ / norm).take(Similarity.pqSubDim)
      }.toMap
    val (codes, cents) = Similarity.pqBuild(emb)
    val code0 = codes.select("vec_id", "c0").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cent0 = cents.filter(col("sub") === 0)
      .select("cell", "centroid").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def g12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val terms = base.toSeq.map { case (id, v) =>
      val c = cent0(code0(id))
      def d(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      g12(d(v, v) - 2 * d(v, c) + d(c, c))
    }
    val expect = BigDecimal(terms.sum.toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L)._2 === expect)
  }

  test("pqBuild: an exact duplicate vector gets the exact same codes") {
    // clone vec 0 under a fresh id; same floats => same subvectors =>
    // same argmin cell in every subspace (ties broken identically)
    val dup = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(999999L))
    val (codes, _) = Similarity.pqBuild(emb.unionByName(dup))
    val rows = codes.filter(col("vec_id").isin(0L, 999999L))
      .collect().map(r => (0 until Similarity.pqM).map(s =>
        r.getLong(r.fieldIndex(s"c$s"))))
    assert(rows.length === 2)
    assert(rows(0) === rows(1), "duplicate vectors must share all codes")
  }

  test("pqTopK: deterministic under input repartitioning") {
    val a = Similarity.pqTopK(emb).collect().map(_.toString)
    val b = Similarity.pqTopK(emb.repartition(7)).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("residual IVFADC: reconstruction error strictly shrinks vs raw " +
      "PQ at the same code budget") {
    val base = Similarity.unitized(emb).select(col("vec_id"), col("unit"))
      .localCheckpoint(true)
    val (asg, _) = Similarity.kmeansOnUnits(base)
    // the least-squares center: the cell's decimal-exact mean,
    // NON-unitized (the operator's encode/decode center)
    val cellMeans = asg
      .select(col("cell"), posexplode(col("unit")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(col("v").cast("decimal(28,10)")).cast("double") /
        count(lit(1))).as("cv"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("mcent"))
    val resid = asg.join(broadcast(cellMeans), Seq("cell"))
      .select(col("vec_id"),
        zip_with(col("unit"), col("mcent"), (x, c) => x - c).as("unit"))
    val (rawCodes, rawCents) = Similarity.pqBuildOnUnits(base)
    val (resCodes, resCents) = Similarity.pqBuildOnUnits(resid)

    def centMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Array[Double]] =
      df.collect().map(r => (r.getAs[Number]("sub").longValue(),
          r.getAs[Number]("cell").longValue()) ->
        r.getAs[Seq[Double]]("centroid").toArray).toMap
    def codeMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().map(r => r.getAs[Long]("vec_id") ->
        (0 until Similarity.pqM).map(s => r.getAs[Long](s"c$s"))).toMap
    def decode(codes: Seq[Long], cm: Map[(Long, Long), Array[Double]]): Array[Double] =
      codes.zipWithIndex.flatMap { case (c, s) => cm((s.toLong, c)) }.toArray

    val units = base.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[Seq[Double]]("unit").toArray).toMap
    val cellOf = asg.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val coarse = cellMeans.collect().map(r => r.getAs[Long]("cell") ->
      r.getAs[Seq[Double]]("mcent").toArray).toMap
    val (rawCm, resCm) = (centMap(rawCents), centMap(resCents))
    val (rawCd, resCd) = (codeMap(rawCodes), codeMap(resCodes))

    def sqErr(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val errs = units.keys.toSeq.map { v =>
      val u = units(v)
      val raw = decode(rawCd(v), rawCm)
      val res = coarse(cellOf(v)).zip(decode(resCd(v), resCm))
        .map { case (c, r) => c + r }
      (sqErr(u, raw), sqErr(u, res))
    }
    val meanRaw = errs.map(_._1).sum / errs.size
    val meanRes = errs.map(_._2).sum / errs.size
    assert(meanRes < meanRaw,
      s"residual mean sq reconstruction error $meanRes must beat raw $meanRaw")
    // Magnitude note: the achievable reduction is bounded by how much
    // the coarse quantizer explains (≈ ‖cell mean‖² of unit vectors);
    // this synthetic corpus is weakly clustered, so the gain is a few
    // percent — material on real clustered embeddings. The computation
    // is fully deterministic, so a 1% materiality bar is noise-free.
    assert(meanRes < meanRaw * 0.99,
      s"expected >=1% error reduction, got raw=$meanRaw res=$meanRes")
  }

  test("ivfPqResidualTopK: deterministic under input repartitioning") {
    val a = Similarity.ivfPqResidualTopK(emb).collect().map(_.toString)
    val b = Similarity.ivfPqResidualTopK(emb.repartition(7))
      .collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }

  test("rerankTopK: final scores are EXACT cosines (stage 2 rescores), " +
      "descending per query") {
    val exact = Similarity.bruteForceTopK(emb, k = Int.MaxValue - 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val out = Similarity.rerankTopK(emb).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(3))
      val cosines = byRank.map(_.getDouble(2)).toSeq
      assert(cosines === cosines.sorted.reverse, "rank order = cosine desc")
      byRank.foreach { r =>
        assert(r.getDouble(2) === exact((r.getLong(0), r.getLong(1))),
          "stage-2 score must be the exact cosine, not the ADC estimate")
      }
    }
  }

  test("binaryTopK: hamming matches a per-dimension sign recomputation") {
    val units = Similarity.unitized(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[collection.Seq[Double]]("unit"))
      .toMap
    def sig(u: collection.Seq[Double]): collection.Seq[Boolean] = u.map(_ > 0)
    val out = Similarity.binaryTopK(emb).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      val expect = sig(units(q)).zip(sig(units(n))).count { case (a, b) => a != b }
      assert(r.getLong(2) === expect.toLong, s"hamming($q, $n)")
    }
  }

  test("matryoshkaFidelity: truncation at the full dim is the identity " +
      "(overlap exactly k); counts stay in range") {
    val k = 5
    val out = Similarity.matryoshkaFidelity(emb, k = k, dims = Seq(16, 64))
      .collect()
    val byDim = out.groupBy(_.getAs[Long]("dim"))
    // dim 64 = no truncation: the two rankings are the same ranking
    byDim(64L).foreach { r =>
      assert(r.getAs[Long]("n_overlap") === k.toLong,
        s"query ${r.getAs[Long]("query_id")}")
      assert(r.getAs[Double]("overlap_at_k") === 1.0)
    }
    // every query reports once per dim, counts bounded by k
    assert(byDim(16L).length === byDim(64L).length)
    byDim(16L).foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0L && n <= k.toLong)
    }
  }

  test("ivfPqTopK: neighbors come only from probed cells, scores are " +
      "the PQ scores") {
    val out = Similarity.ivfPqTopK(emb).collect()
    assert(out.nonEmpty)
    // every (query, neighbor, cosine) must appear in the unpruned PQ
    // ranking with the same ADC score — IVF only prunes, never rescores
    val full = Similarity.pqTopK(emb, k = Int.MaxValue - 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    out.foreach { r =>
      assert(full.contains((r.getLong(0), r.getLong(1), r.getDouble(2))))
    }
  }
}
