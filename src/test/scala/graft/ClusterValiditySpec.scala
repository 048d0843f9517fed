package graft

import graft.operators.Similarity
import graft.sources.Tables

/** Davies–Bouldin and Calinski–Harabasz recomputed locally from the
  * engine's own Lloyd assignment on the real sf0.001 embeddings. */
class ClusterValiditySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def assignment() = {
    val (asg, cents) = Similarity.kmeans(Tables.embeddings(spark, dir))
    val members = asg.select("cell", "vec_id", "unit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val cs = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    (members, cs)
  }

  private def rcos(a: Array[Double], b: Array[Double]): Double =
    BigDecimal(a.zip(b).map(t => t._1 * t._2).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("daviesBouldin: S_i / R_max / DB match a local recomputation " +
      "(sf0.001)") {
    val out = Similarity.daviesBouldin(Tables.embeddings(spark, dir))
      .collect()
    val (members, cs) = assignment()
    val byCell = members.groupBy(_._1)
    val si = byCell.map { case (c, ms) =>
      c -> ms.map(m => 1.0 - rcos(m._3, cs(c))).sum / ms.length
    }
    val di = cs.keys.map { i =>
      i -> cs.keys.filter(_ != i).map { j =>
        (si(i) + si(j)) / (1.0 - rcos(cs(i), cs(j)))
      }.max
    }.toMap
    val db = di.values.sum / di.size
    assert(out.length === byCell.size)
    out.foreach { r =>
      val c = r.getLong(0)
      assert(r.getLong(1) === byCell(c).length.toLong)
      assert(math.abs(r.getDouble(2) - si(c)) < 1e-5, s"cell $c S_i")
      assert(math.abs(r.getDouble(3) - di(c)) < 1e-4, s"cell $c R_max")
      assert(math.abs(r.getDouble(4) - db) < 1e-4)
    }
  }

  test("richClub: club sizes/edges/phi match a local recomputation " +
      "from the engine's mutual-kNN edges (sf0.001)") {
    val edges = Similarity
      .mutualKnnGraph(Tables.embeddings(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val out = Similarity.richClub(Tables.embeddings(spark, dir))
      .collect()
    assert(out.length === 3)
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    out.foreach { r =>
      val t = r.getLong(0).toInt
      val club = deg.filter(_._2 >= t).keySet
      assert(r.getLong(1) === club.size.toLong, s"t=$t n_club")
      val eT = edges.count(e => club(e._1) && club(e._2))
      assert(r.getLong(2) === eT.toLong, s"t=$t e_club")
      if (!r.isNullAt(3) && club.size > 1)
        assert(math.abs(r.getDouble(3) -
          2.0 * eT / (club.size.toDouble * (club.size - 1))) < 1e-6)
    }
    // monotone club shrinkage
    assert(out.map(_.getLong(1)).toSeq ===
      out.map(_.getLong(1)).toSeq.sorted.reverse)
  }

  test("sampleSystematic: exact ceil(n/k) size, every k-th rank, " +
      "membership matches the hash order (sf0.001)") {
    val docs = Tables.documents(spark, dir)
    val out = graft.operators.Curation.sampleSystematic(docs).collect()
    val n = docs.count()
    val k = graft.operators.Curation.sysK
    assert(out.length === ((n + k - 1) / k).toInt)
    assert(out.forall(r => (r.getLong(3) - 1) % k === 0))
    // membership: recompute the hash order locally
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val ordered = ids.map { id =>
      val hex = md5.digest(
        (graft.operators.Curation.sysSalt + id).getBytes("UTF-8"))
        .map(x => f"${x & 0xff}%02x").mkString.take(8)
      (java.lang.Long.parseLong(hex, 16), id)
    }.sortBy(identity).map(_._2)
    val expect = ordered.zipWithIndex.collect {
      case (id, i) if i % k == 0 => id
    }.toSet
    assert(out.map(_.getLong(0)).toSet === expect)
  }

  test("ckaHalves: CKA matches a local feature-space recomputation " +
      "and lands in [0,1] (sf0.001)") {
    val out = Similarity
      .ckaHalves(Tables.embeddings(spark, dir)).collect()
    assert(out.length === 1)
    val r = out.head
    val units = Similarity.unitized(Tables.embeddings(spark, dir))
      .select("unit").collect().map(_.getSeq[Double](0).toArray)
    val n = units.length
    assert(r.getLong(0) === n.toLong)
    val d2 = 32
    def hsic(av: Array[Array[Double]], bv: Array[Array[Double]]):
        Double = {
      val sa = Array.tabulate(d2)(i => av.map(_(i)).sum)
      val sb = Array.tabulate(d2)(j => bv.map(_(j)).sum)
      (for (i <- 0 until d2; j <- 0 until d2) yield {
        val sij = av.indices.map(k => av(k)(i) * bv(k)(j)).sum
        val c = sij - sa(i) * sb(j) / n
        c * c
      }).sum
    }
    val xs = units.map(_.take(32))
    val ys = units.map(_.drop(32))
    val (hxy, hxx, hyy) = (hsic(xs, ys), hsic(xs, xs), hsic(ys, ys))
    val cka = hxy / math.sqrt(hxx * hyy)
    assert(math.abs(r.getDouble(1) - hxy) < 1e-6, "hsic_xy")
    assert(math.abs(r.getDouble(2) - hxx) < 1e-6, "hsic_xx")
    assert(math.abs(r.getDouble(3) - hyy) < 1e-6, "hsic_yy")
    assert(math.abs(r.getDouble(4) - cka) < 1e-4, "cka")
    assert(r.getDouble(4) >= -1e-9 && r.getDouble(4) <= 1.0 + 1e-9)
  }

  test("calinskiHarabasz: W/B/CH match a local recomputation " +
      "(sf0.001)") {
    val out = Similarity.calinskiHarabasz(Tables.embeddings(spark, dir))
      .collect()
    assert(out.length === 1)
    val r = out.head
    val (members, cs) = assignment()
    val n = members.length
    val k = cs.size
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === k.toLong)
    val w = members.map(m => 2.0 - 2.0 * rcos(m._3, cs(m._1))).sum
    assert(math.abs(r.getDouble(2) - w) < 1e-4, "W")
    val dim = members.head._3.length
    val g = (0 until dim).map(p =>
      members.map(_._3(p)).sum / n).toArray
    val b = members.groupBy(_._1).map { case (c, ms) =>
      val cg = rcos(cs(c), g)
      val gg = rcos(g, g)
      ms.length * (1.0 - 2.0 * cg + gg)
    }.sum
    assert(math.abs(r.getDouble(3) - b) < 1e-4, "B")
    val ch = (b / (k - 1.0)) / (w / (n - k.toDouble))
    assert(math.abs(r.getDouble(4) - ch) <
      1e-3 * math.max(1.0, math.abs(ch)), "CH")
  }
}
