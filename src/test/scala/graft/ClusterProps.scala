package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Dedup

/** Property: large-star/small-star connected components equal label
  * propagation on arbitrary graphs — including the shapes that stress
  * each algorithm (chains = worst diameter for propagation, hubs =
  * worst skew for star ops). */
object ClusterProps extends Properties("ClustersBigStar") {

  // every trial runs two iterative Spark algorithms — keep trials low
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private def pairsDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("doc_a", "doc_b")
  }

  private def components(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val edgeGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(2, 25)
    m <- Gen.choose(1, 40)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong) if a != b
    } yield (a, b))
  } yield edges

  property("equals label propagation on random graphs (both the local " +
      "union-find fast path and the forced distributed star path)") =
    forAll(edgeGen) { edges =>
      edges.isEmpty || {
        val expect = components(Dedup.clusters(pairsDf(edges)))
        // default threshold -> single-task union-find fast path
        components(Dedup.clustersBigStar(pairsDf(edges))) == expect &&
          // threshold 0 -> the distributed large/small-star rounds
          components(Dedup.clustersBigStar(pairsDf(edges),
            localMaxEdges = 0L)) == expect
      }
    }

  property("chain collapses to single min-labeled component (both paths)") =
    forAll(Gen.choose(2, 40)) { n =>
      val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      val local = components(Dedup.clustersBigStar(pairsDf(chain)))
      val dist = components(Dedup.clustersBigStar(pairsDf(chain),
        localMaxEdges = 0L))
      local.size == n && local.values.forall(_ == 0L) && dist == local
    }
}
