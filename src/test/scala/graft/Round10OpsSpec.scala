package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Fixture-level semantics for the round-10 operators — the
  * properties the oracle hash can't articulate (truss fixpoints on
  * known graphs, multi-round cascade behavior). */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side convergent truss peel (support ≥ ktrussK − 2) — the
    * ground truth the distributed peel must match on any graph. */
  private def trussFixpoint(edges: Set[(Long, Long)]): Set[(Long, Long)] = {
    def supports(es: Set[(Long, Long)]): Map[(Long, Long), Int] = {
      val adj = (es.toSeq ++ es.toSeq.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).toSet }
      es.iterator.map { case (a, b) =>
        (a, b) -> (adj(a) intersect adj(b)).size
      }.toMap
    }
    var es = edges
    var changed = true
    while (changed) {
      val sup = supports(es)
      val next = es.filter(e => sup(e) >= Similarity.ktrussK - 2)
      changed = next != es
      es = next
    }
    es
  }

  private def peel(edges: Seq[(Long, Long)]): Array[(Long, Long, Long, Long, Boolean)] =
    Similarity.ktrussPeel(edges.toDF("vec_a", "vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))

  test("ktrussPeel: K4 is the minimal 4-truss — every edge in exactly " +
      "2 triangles, stable in one check") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val out = peel(k4)
    assert(out.length === 6)
    out.foreach { e =>
      assert(e._3 === 2L && e._4 === 2L && e._5, s"K4 edge wrong: $e")
    }
  }

  test("ktrussPeel: an apex-reinforced triangle strip cascades over " +
      "MULTIPLE rounds to the empty truss — a single bounded round " +
      "would keep edges the fixpoint drops") {
    // spine 0-7, rungs (i, i+2), one apex 100+i bracing each rung:
    // round 1 drops the support-1 apex edges, round 2 the rungs they
    // braced, round 3 the spine — depth 3, empty 4-truss
    val spine = (0L to 6L).map(i => (i, i + 1))
    val rungs = (0L to 5L).map(i => (i, i + 2))
    val apex = (0L to 5L).flatMap(i => Seq((i, 100L + i), (i + 2, 100L + i)))
    val edges = spine ++ rungs ++ apex
    val out = peel(edges)
    assert(out.length === edges.length)
    assert(out.forall(e => !e._5 && e._4 === 0L),
      "the 4-truss of the strip must be empty")
    // ground truth agrees, and a one-round bound would NOT: after one
    // round the rungs still stand (their apex triangle died only that
    // round), so the bounded answer differs from the fixpoint
    val edgeSet = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    assert(trussFixpoint(edgeSet).isEmpty)
    def oneRound(es: Set[(Long, Long)]): Set[(Long, Long)] = {
      val adj = (es.toSeq ++ es.toSeq.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).toSet }
      es.filter { case (a, b) =>
        (adj(a) intersect adj(b)).size >= Similarity.ktrussK - 2 }
    }
    assert(oneRound(edgeSet).nonEmpty,
      "fixture must cascade past round 1 to prove the loop matters")
  }

  test("coreness on the sf0.001 corpus equals driver-side convergent " +
      "peels at every threshold (highest surviving wins)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.coreness(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.nonEmpty)
    val e0 = Similarity.mutualKnnGraph(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def corePeel(edges: Set[(Long, Long)], k: Int): Set[Long] = {
      var es = edges
      var changed = true
      while (changed) {
        val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size }
        val keep = deg.filter(_._2 >= k).keySet
        val next = es.filter(e => keep(e._1) && keep(e._2))
        changed = next != es
        es = next
      }
      es.toSeq.flatMap(e => Seq(e._1, e._2)).toSet
    }
    val cores = (1 to 3).map(k => k -> corePeel(e0, k)).toMap
    out.foreach { case (node, c) =>
      val expect = (1 to 3).filter(k => cores(k)(node)).lastOption.getOrElse(0)
      assert(c === expect.toLong, s"coreness of $node")
    }
    // the decomposition must actually be a ladder on this corpus:
    // some nodes peel out between thresholds
    assert(out.values.toSet.size > 1, "corpus coreness must not be flat")
  }

  test("bfsRadius on the sf0.001 corpus equals driver-side BFS from " +
      "every component's min-id representative") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.bfsRadius(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.nonEmpty)
    val e0 = Similarity.mutualKnnGraph(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e0 ++ e0.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).toSet }
    // components by min-label flood, BFS from each min id
    var label = adj.keys.map(n => n -> n).toMap
    var changed = true
    while (changed) {
      val next = label.map { case (n, l) =>
        n -> (adj(n).map(label) + l).min }
      changed = next != label
      label = next
    }
    val seeds = label.values.toSet
    assert(out.keySet === seeds)
    seeds.foreach { s =>
      var dist = Map(s -> 0L)
      var frontier = Set(s)
      while (frontier.nonEmpty) {
        val nxt = frontier.flatMap(adj).diff(dist.keySet)
        val d = dist(frontier.head) + 1
        dist ++= nxt.map(_ -> d)
        frontier = nxt
      }
      val (n, ecc, mean) = out(s)
      assert(n === dist.size.toLong, s"n_reached of seed $s")
      assert(ecc === dist.values.max, s"eccentricity of seed $s")
      val expect = BigDecimal(dist.values.sum.toDouble / dist.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(mean === expect, s"mean_dist of seed $s")
    }
  }

  test("ktruss on the sf0.001 corpus graph equals the driver-side " +
      "convergent peel (same fixpoint contract as kcore)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.ktruss(emb).collect()
    assert(out.nonEmpty)
    val opTruss = out.filter(_.getBoolean(4))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e0 = Similarity.mutualKnnGraph(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(opTruss === trussFixpoint(e0),
      s"distributed peel (${opTruss.size} edges) must equal the " +
        s"fixpoint truss (${trussFixpoint(e0).size})")
    // dropped edges are genuinely out: final support below threshold
    out.filterNot(_.getBoolean(4)).foreach { r =>
      assert(r.getLong(3) < Similarity.ktrussK - 2,
        s"dropped edge with truss-worthy support: $r")
    }
  }

  test("yuleSimpson: hand corpus — freq-of-freq moments give the " +
      "closed-form K and D") {
    val docs = Seq((1L, "a a b", "x"), (2L, "a c", "x"))
      .toDF("doc_id", "text", "lang")
    val out = graft.operators.TextAnalysis.yuleSimpson(docs).collect()
    assert(out.length === 1)
    val r = out.head
    // freqs a=3 b=1 c=1: N=5, V=3, s2=11, rep2=6
    assert(r.getLong(1) === 5L && r.getLong(2) === 3L)
    assert(r.getDouble(3) === 10000.0 * (11 - 5) / 25.0, "yule_k")
    assert(r.getDouble(4) === 0.3, "simpson_d")
  }

  test("paretoDocs: hand corpus — dominated docs drop, signal ties " +
      "stay on the frontier together") {
    def doc(id: Long, text: String) = (id, text, "x", text.length.toLong)
    val docs = Seq(
      doc(1L, "aaa bbb"),        // 2 toks, punct 0   — dominated by 3
      doc(2L, "a, b,"),          // 2 toks, punct 0.4 — dominated by 3
      doc(3L, "aaa bbb ccc"),    // 3 toks, punct 0   — frontier
      doc(4L, "x, y, z, w,"),    // 4 toks, punct>0   — frontier (most toks)
      doc(5L, "ddd eee fff"))    // ties doc 3 exactly — stays with it
      .toDF("doc_id", "text", "lang", "n_chars")
    val out = graft.operators.Curation.paretoDocs(docs).collect()
      .map(_.getLong(1)).toSet
    assert(out === Set(3L, 4L, 5L))
  }

  test("headCoverage: 12-type hand corpus — top-10 mass excludes " +
      "exactly the two tail types") {
    // type ti repeats (13-i) times: freqs 12..1, N = 78
    val text = (1 to 12).flatMap(i => Seq.fill(13 - i)(f"t$i%02d"))
      .mkString(" ")
    val docs = Seq((1L, text, "x")).toDF("doc_id", "text", "lang")
    val out = graft.operators.TextAnalysis.headCoverage(docs).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 78L && r.getLong(2) === 12L)
    assert(r.getDouble(3) ===
      BigDecimal(75.0 / 78.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, "top10_share")
    assert(r.getDouble(4) === 1.0 && r.getDouble(5) === 1.0)
  }

  test("participationRatio: isotropic cloud reads n_dims, rank-1 " +
      "collapse reads 1") {
    val iso = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val r1 = Similarity.participationRatio(iso).collect().head
    assert(r1.getLong(0) === 2L)
    assert(r1.getDouble(2) === 2.0, "isotropic PR = n_dims")
    assert(r1.getDouble(3) === 1.0, "isotropic share = 1")
    val flat = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r2 = Similarity.participationRatio(flat).collect().head
    assert(r2.getDouble(2) === 1.0, "rank-1 PR = 1")
  }

  test("personalizedPagerank on the sf0.001 corpus matches driver-side " +
      "seeded diffusion and flags exactly the mod-class seeds") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.personalizedPagerank(emb).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getDouble(2)))).toMap
    assert(out.nonEmpty)
    out.foreach { case (v, (isSeed, _)) =>
      assert(isSeed === (v % Similarity.pprSeedMod == 0), s"seed flag $v")
    }
    // driver-side plain-double diffusion (the decimal crossings only
    // perturb below 1e-9 over prIters rounds)
    val edges = Similarity.knnGraph(emb)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val outdeg = edges.groupBy(_._1).map { case (u, xs) => u -> xs.length }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    def seed(v: Long) = if (v % Similarity.pprSeedMod == 0) 1.0 else 0.0
    var p = nodes.map(v => v -> seed(v)).toMap
    for (_ <- 1 to Similarity.prIters) {
      val inflow = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => p(e._1) / outdeg(e._1)).sum
      }
      p = nodes.map(v => v -> ((1 - Similarity.prDamping) * seed(v) +
        Similarity.prDamping * inflow.getOrElse(v, 0.0))).toMap
    }
    p.foreach { case (v, expect) =>
      assert(math.abs(out(v)._2 - expect) < 1e-8, s"ppr of $v")
    }
    // the diffusion must actually spread: some NON-seed node carries
    // positive mass (it sits downstream of a seed)
    assert(out.exists { case (v, (s, score)) => !s && score > 0.0 },
      "no non-seed received diffused mass")
  }
}
