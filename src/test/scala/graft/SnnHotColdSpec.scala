package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The hot/cold split self-join behind [[Similarity.snnGraph]] is a
  * pure performance rewrite: any hotK must produce row-for-row the
  * plain shuffle self-join (hotK = 0 IS the plain join — the hot
  * branch is empty), including on a deliberately hub-concentrated
  * adjacency where the split actually matters. */
class SnnHotColdSpec extends SparkSpec {
  import spark.implicits._

  /** Hubbed adjacency: every node points at hub 0 (indeg = n−1) plus
    * its ring successor (indeg 1 each) — one key carries almost all
    * the candidate mass, the shape the broadcast branch exists for. */
  private def hubbedAdjacency(n: Int): DataFrame =
    (1L until n.toLong).flatMap(i =>
      Seq((i, 0L), (i, i % (n - 1) + 1))).toDF("vec_id", "neighbor_id")

  private def counts(g: DataFrame, hotK: Int): Set[(Long, Long, Long)] =
    Similarity.snnSharedCounts(g, hotK).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("snnSharedCounts: hotK = 0 (all-cold plain join), the default, " +
      "and hotK > #keys (all-hot) agree row-for-row on a hubbed graph") {
    val g = hubbedAdjacency(40)
    val plain = counts(g, 0)
    assert(plain.nonEmpty)
    assert(counts(g, Similarity.snnHotKeys) === plain)
    assert(counts(g, 1000) === plain)
    // the hub really concentrates: 39 in-neighbors of node 0 form
    // C(39,2) = 741 candidate pairs through that single key
    val viaHub = plain.count(_._3 >= 1L)
    assert(viaHub >= 741 / 2, s"hub candidates missing ($viaHub pairs)")
  }

  test("snnGraph on the sf0.001 corpus equals a driver-side plain " +
      "shared-neighbor recomputation (split is invisible end-to-end)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.snnGraph(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // ground truth from the same kNN adjacency, paired in driver code
    val adj = Similarity.knnGraph(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byNeighbor = adj.groupBy(_._2)
    val outdeg = adj.groupBy(_._1).map { case (v, xs) => v -> xs.length }
    val shared = byNeighbor.values.toSeq.flatMap { rows =>
      val vs = rows.map(_._1).sorted
      for (i <- vs.indices; j <- (i + 1) until vs.length)
        yield (vs(i), vs(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    assert(out.keySet === shared.keySet)
    shared.foreach { case ((a, b), s) =>
      val (os, oj) = out((a, b))
      assert(os === s, s"shared count for ($a,$b)")
      val expect = math.rint(
        s.toDouble / (outdeg(a) + outdeg(b) - s) * 1e6) / 1e6
      assert(oj === expect, s"snn jaccard for ($a,$b)")
    }
  }
}
