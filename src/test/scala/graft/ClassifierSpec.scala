package graft

import org.apache.spark.sql.DataFrame

import graft.operators.TextAnalysis

/** Hashed-linear-classifier invariants: the margin is a deterministic
  * sequential fold (partition-layout independent), the score/label
  * derive from it consistently, and the weight table matches its
  * defining formula. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val fixture = docs(
    0L -> "the quick brown fox jumps over the lazy dog",
    1L -> "spark catalyst tungsten codegen whole stage",
    2L -> "one",
    3L -> "the the the the the the") // repeated token: margin = w(bucket)

  test("classifier: deterministic under repartitioning") {
    val a = TextAnalysis.classifierScore(fixture).collect()
      .map(_.toString).sorted
    val b = TextAnalysis.classifierScore(fixture.repartition(5)).collect()
      .map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("classifier: label == (margin > 0) and score in (0, 1), " +
      "monotone in margin") {
    val rows = TextAnalysis.classifierScore(fixture).collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    rows.foreach { case (margin, score, label) =>
      assert(label === (margin > 0))
      assert(score > 0.0 && score < 1.0)
    }
    val sorted = rows.sortBy(_._1)
    assert(sorted.map(_._2).toSeq === sorted.map(_._2).sorted.toSeq,
      "score is monotone in margin")
  }

  test("classifier: a single repeated token's margin equals its bucket " +
      "weight (the fold divides by n)") {
    val out = TextAnalysis.classifierScore(docs(3L -> "the the the the"))
      .collect()(0)
    val single = TextAnalysis.classifierScore(docs(4L -> "the")).collect()(0)
    assert(out.getDouble(2) === single.getDouble(2),
      "mean of n equal weights = the weight")
  }

  test("classifier runs unchanged on a stream (batch/stream shared op)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val rows = Seq((0L, "the quick brown fox"), (1L, "spark catalyst codegen"))
    val stream = MemoryStream[(Long, String)]
    val streamDocs = stream.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        lit("en").as("lang"), lit("src0").as("source"),
        length(col("_2")).cast("long").as("n_chars"))
    // stateless map-side op: the SAME transform accepts a streaming DF
    val q = TextAnalysis.classifierScore(streamDocs).writeStream
      .format("memory").queryName("cls_sink").outputMode("append").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("cls_sink").orderBy("doc_id").collect()
      val batch = TextAnalysis.classifierScore(docs(rows: _*))
        .orderBy("doc_id").collect()
      assert(streamed.length === batch.length && batch.length === 2)
      streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
    } finally q.stop()
  }

  test("classifier: weight table matches the universal-hash formula") {
    val (a, b) = TextAnalysis.clsCoeffs
    val w = TextAnalysis.clsWeights
    assert(w.length === TextAnalysis.clsDim)
    val p = graft.functions.Portable.P31
    assert(w(0) === ((a + b) % p).toDouble / p - 0.5)
    assert(w(17) === ((a * 18 + b) % p).toDouble / p - 0.5)
    assert(w.forall(x => x >= -0.5 && x <= 0.5))
  }
}
