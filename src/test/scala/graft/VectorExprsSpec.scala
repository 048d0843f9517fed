package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExprs
import graft.operators.Similarity

/** Native DotProduct expression: value parity with the HOF form it
  * replaced, codegen + interpreted paths, and SQL registration via
  * GraftExtensions. */
class VectorExprsSpec extends SparkSpec {

  test("dotNative equals the interpreted HOF dot, float and double arrays") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.5f, -2f, 3f), Seq(2.0, 0.5, 1.0)),
      (Seq(0f, 0f, 0f), Seq(1.0, 1.0, 1.0)))
      .toDF("fv", "dv")
    val hof = aggregate(zip_with(col("fv"), col("dv"),
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(
      VectorExprs.dotNative(col("fv"), col("dv")).as("native"), hof.as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    assert(rows(0).getDouble(0) === 1.5 * 2.0 + -2.0 * 0.5 + 3.0)
  }

  test("graft_dot is callable from SQL via SparkSessionExtensions") {
    val v = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(v === 11.0)
  }

  test("graft_dot rejects non-array inputs with a typed analysis error") {
    val e = intercept[Exception](
      spark.sql("SELECT graft_dot(1, 2)").collect())
    assert(e.getMessage.contains("graft_dot"))
  }

  test("cosine of a vector with itself is 1.0 after unitizing") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(3f, 4f))).toDF("embedding")
    val u = df.select(Similarity.unitize(col("embedding")).as("u"))
    val c = u.select(Similarity.cosineUnit(col("u"), col("u")).as("c"))
      .collect().head.getDouble(0)
    assert(c === 1.0)
  }

  test("outliers: a planted opposite vector ranks first for its label") {
    import spark.implicits._
    // label 0: four near-identical vectors plus one pointing the other
    // way; label 1: a clean cluster (no rank-1 surprises expected)
    val vecs = Seq(
      (0L, Seq(1f, 0.1f), 0), (1L, Seq(1f, -0.1f), 0),
      (2L, Seq(1f, 0.05f), 0), (3L, Seq(0.9f, 0f), 0),
      (4L, Seq(-1f, 0f), 0), // the outlier
      (10L, Seq(0f, 1f), 1), (11L, Seq(0.1f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.outliers(vecs, k = 2).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("rn")) ->
        r.getAs[Long]("vec_id")).toMap
    assert(out((0, 1L)) === 4L)
  }

  test("normStats: hand-checkable norms - 3-4-5 style vectors give " +
      "exact mean/sd/extremes and a positive cv") {
    import spark.implicits._
    val d = Seq(
      (1L, 0L, Array(3.0f, 4.0f)),   // norm 5
      (2L, 0L, Array(6.0f, 8.0f)),   // norm 10
      (3L, 0L, Array(0.0f, 1.0f)))   // norm 1
      .toDF("vec_id", "label", "embedding")
    val r = graft.operators.Similarity.normStats(d).collect().head
    assert(r.getLong(0) === 3L)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mean = 16.0 / 3.0
    val sd = math.sqrt((25.0 + 100.0 + 1.0) / 3.0 - mean * mean)
    assert(math.abs(r.getDouble(1) - r6(mean)) < 1e-9)
    assert(math.abs(r.getDouble(2) - sd) < 1e-6)
    assert(r.getDouble(3) === 1.0 && r.getDouble(4) === 10.0)
    assert(math.abs(r.getDouble(5) - sd / mean) < 1e-6)
  }
}
