package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Skew

/** Property: the hot/cold split join equals the plain inner join at ANY
  * hotK — including hotK = 0 (everything cold), hotK ≥ |small|
  * (everything hot, empty cold branch), and skewed large sides where
  * most rows hit one key. The split is a pure performance rewrite; a
  * single lost or duplicated row at any K is a bug. */
object SkewProps extends Properties("HotColdJoin") {

  // each trial runs several Spark jobs (checkpoint + two joins) — keep low
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private case class Fixture(large: Seq[(String, Long)],
      small: Seq[(String, Long)], hotK: Int)

  private val fixtureGen: Gen[Fixture] = for {
    nKeys <- Gen.choose(1, 8)
    keys = (0 until nKeys).map(i => s"k$i")
    nLarge <- Gen.choose(0, 60)
    // skew: key 0 drawn ~half the time
    large <- Gen.listOfN(nLarge, for {
      k <- Gen.frequency((nKeys, Gen.const(keys.head)),
        (nKeys, Gen.oneOf(keys)))
      v <- Gen.choose(0L, 99L)
    } yield (k, v))
    smallKeys <- Gen.someOf(keys)
    hotK <- Gen.choose(0, 10)
  } yield Fixture(large,
    smallKeys.zipWithIndex.map { case (k, i) => (k, i.toLong + 1) }.toSeq, hotK)

  property("equals the plain inner join at any hotK") =
    forAll(fixtureGen) { f =>
      import spark.implicits._
      {
        val large = f.large.toDF("key", "v")
        val small = f.small.toDF("key", "w")
        val plain = large.join(small, Seq("key")).collect()
          .map(_.mkString("|")).sorted.toSeq
        val split = Skew.hotColdJoin(large, small, Seq("key"),
            col("w"), f.hotK).collect()
          .map(_.mkString("|")).sorted.toSeq
        plain == split
      }
    }
}
