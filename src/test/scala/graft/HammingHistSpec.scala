package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Multimodal
import graft.sources.Tables

/** Independent certification of the round-12 fingerprint-multiplicity
  * compression in [[Multimodal.phashHammingHist]]: the shipped form
  * computes the histogram over DISTINCT signatures (cross pairs
  * weighted m_a·m_b, C(m,2) within-signature pairs at Hamming 0); this
  * spec recomputes the DOC-grain statement — band-colliding doc pairs,
  * distinct, counted per Hamming — and asserts row identity, on real
  * data at two scales AND on a constructed fixture with heavy copy
  * multiplicity (the sf10 MakeScale shape that motivated the
  * compression: the doc-grain distinct outgrew a 74 GB disk). The
  * FuzzyBlockingSpec pattern: when the oracle adopts the engine's
  * optimization, an independent spec restores the naive-form proof. */
class HammingHistSpec extends SparkSpec {

  /** The pre-compression doc-grain statement, verbatim: band-collision
    * candidates at Hamming ≤ 32, distinct pairs, histogram + cum. */
  private def docGrainHist(documents: DataFrame): DataFrame = {
    val hist = Multimodal.phashCandidates(documents, 32)
      .groupBy(col("hamming")).agg(count(lit(1)).as("n_pairs"))
    val tot = hist.agg(sum(col("n_pairs")).as("n_total"))
    val w = Window.orderBy(col("hamming"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.crossJoin(broadcast(tot))
      .select(col("hamming"), col("n_pairs"),
        sum(col("n_pairs")).over(w).as("cum_pairs"),
        round(sum(col("n_pairs")).over(w).cast("double") /
          col("n_total"), 6).as("cum_share"),
        (col("hamming") <= 7).as("in_recall_band"))
      .orderBy(col("hamming"))
  }

  private def assertIdentical(documents: DataFrame): Unit = {
    val got = Multimodal.phashHammingHist(documents).collect().toSeq
    val want = docGrainHist(documents).collect().toSeq
    assert(got === want)
  }

  test("compressed == doc-grain on real data, sf0.001") {
    assertIdentical(Tables.documents(spark, "/root/testdata/sf0.001"))
  }

  test("compressed == doc-grain on real data, sf0.01") {
    assertIdentical(Tables.documents(spark, "/root/testdata/sf0.01"))
  }

  test("compressed == doc-grain on a copy-multiplied fixture") {
    // the MakeScale shape: a few base payloads, each copied many times
    // (identical signatures, m up to 40), plus near-copies (single-byte
    // edits -> small Hamming) and unrelated payloads
    val base = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running far",
      "pack my box with five dozen liquor jugs before the premium spoils",
      "sphinx of black quartz judge my vow while the jackdaws love quins")
    val rows = (for {
      (t, bi) <- base.zipWithIndex
      c <- 0 until (10 + 15 * bi) // multiplicities 10 / 25 / 40
    } yield (bi * 1000L + c, t)) ++
      // near-copies: one character changed mid-string
      base.zipWithIndex.map { case (t, bi) =>
        (9000L + bi, t.updated(t.length / 2, 'Q'))
      } ++
      // unrelated tails
      (0 until 7).map(i => (9900L + i,
        s"completely different payload number $i with its own byte mix $i$i"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 4),
      schema)
    assertIdentical(docs)
  }
}
