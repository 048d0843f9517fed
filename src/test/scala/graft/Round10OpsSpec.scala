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
}
