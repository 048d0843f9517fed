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
