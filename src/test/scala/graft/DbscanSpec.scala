package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Similarity
import graft.sources.Tables

/** DBSCAN semantics: a planted density fixture where every role is
  * hand-derivable (core clique, a border satellite, a low-density pair
  * that must stay noise), plus a full local recomputation of
  * roles/clusters on the real sf0.001 embeddings from the engine's own
  * cell assignment. */
class DbscanSpec extends SparkSpec {
  import spark.implicits._

  // 8 vectors in 4 dims at tau=0.4, minPts=3, ONE cell (density logic
  // only — cell restriction is covered by KnnGraphSpec):
  //  - 0..3: a pairwise >= 0.62-cosine clique -> all core, cluster 0
  //  - 4: cosine 0.42 to vector 0 only -> 1 nbr -> border of cluster 0
  //  - 5: far from everything -> noise
  //  - 6,7: mutual cosine 0.9 but degree 1 and no core nbr -> noise
  private def emb: DataFrame = Seq(
    (0L, Array(1f, 0f, 0f, 0f), 0),
    (1L, Array(0.9f, 0.4359f, 0f, 0f), 0),
    (2L, Array(0.9f, -0.4359f, 0f, 0f), 0),
    (3L, Array(0.9f, 0f, 0.4359f, 0f), 0),
    (4L, Array(0.42f, 0f, -0.35f, 0.8373f), 0),
    (5L, Array(0f, 0f, 0f, -1f), 0),
    (6L, Array(-1f, 0f, 0f, 0f), 0),
    (7L, Array(-0.9f, -0.4359f, 0f, 0f), 0))
    .toDF("vec_id", "embedding", "label")

  test("dbscan: planted fixture — core clique, border satellite, " +
      "low-density pair stays noise") {
    val out = Similarity.dbscan(emb, tau = 0.4, minPts = 3, cells = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))).toMap
    assert(out.size === 8)
    (0L to 3L).foreach { id =>
      assert(out(id)._1 === "core", s"id $id")
      assert(out(id)._2 === 0L, s"id $id cluster")
    }
    assert(out(4L) === (("border", 0L, 1L)))
    assert(out(5L)._1 === "noise")
    assert(out(5L)._2 === -1L)
    assert(out(6L) === (("noise", -1L, 1L)))
    assert(out(7L) === (("noise", -1L, 1L)))
  }

  test("dbscan: roles and cluster ids match a local recomputation " +
      "from the engine's cell assignment (sf0.001)") {
    val embDf = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.dbscan(embDf).collect()
    assert(out.length === 500)
    val (asg, _) = Similarity.kmeans(embDf)
    val rows = asg.select("cell", "vec_id", "unit").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray))
    // in-cell rounded-cosine eps graph
    val nbrs = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    for {
      (ca, ia, ua) <- rows; (cb, ib, ub) <- rows
      if ca == cb && ia != ib
    } {
      val cos = BigDecimal(ua.zip(ub).map(t => t._1 * t._2).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (cos >= Similarity.dbscanTau) nbrs(ia) = nbrs(ia) + ib
    }
    val cores = rows.map(_._2)
      .filter(id => nbrs(id).size >= Similarity.dbscanMinPts).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for (c <- cores; n <- nbrs(c) if cores(n)) {
      val (ra, rb) = (find(c), find(n))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clusterOf = cores.map(c => c -> find(c)).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(3) === nbrs(id).size.toLong, s"$id n_nbrs")
      if (cores(id)) {
        assert(r.getString(1) === "core", s"$id role")
        assert(r.getLong(2) === clusterOf(id), s"$id cluster")
      } else if (nbrs(id).exists(cores)) {
        assert(r.getString(1) === "border", s"$id role")
        assert(r.getLong(2) ===
          nbrs(id).filter(cores).map(clusterOf).min, s"$id border cluster")
      } else {
        assert(r.getString(1) === "noise", s"$id role")
        assert(r.isNullAt(2), s"$id noise cluster")
      }
    }
  }
}
