package graft

import org.apache.spark.sql.DataFrame

import org.apache.spark.sql.functions.{col, lit}

import graft.operators.Similarity

/** SemDeDup semantics on a planted fixture: identical vectors always
  * land in the same k-means cell (same argmax, same tiebreak), so the
  * later copy must flag as a duplicate of the earlier one, and the
  * keep-first-by-id rule must leave exactly one representative. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // 8 vectors in 4 dims: two orthogonal pairs per axis direction plus
  // an exact duplicate of vector 0 at id 5 and of vector 2 at id 7.
  private def emb: DataFrame = Seq(
    (0L, Array(1f, 0f, 0f, 0f), 0),
    (1L, Array(0f, 1f, 0f, 0f), 0),
    (2L, Array(0f, 0f, 1f, 0f), 1),
    (3L, Array(0f, 0f, 0f, 1f), 1),
    (4L, Array(-1f, 0f, 0f, 0f), 2),
    (5L, Array(1f, 0f, 0f, 0f), 2),  // duplicate of 0
    (6L, Array(0f, -1f, 0f, 0f), 3),
    (7L, Array(0f, 0f, 1f, 0f), 3))  // duplicate of 2
    .toDF("vec_id", "embedding", "label")

  test("semDedup: exact duplicates collapse onto the earliest id; " +
      "non-duplicates keep") {
    val rows = Similarity.semDedup(emb).collect()
    assert(rows.length === 8)
    val byId = rows.map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toMap
    assert(byId(5L) === ((Some(0L), false)), "later copy flags as dup of 0")
    assert(byId(7L) === ((Some(2L), false)), "later copy flags as dup of 2")
    assert(byId(0L)._2 && byId(2L)._2, "first occurrences keep")
    assert(byId.count(!_._2._2) === 2, "exactly the two planted dups drop")
  }

  test("semDedup: duplicate pairs report max_cell_cosine 1.0 on both ends") {
    val rows = Similarity.semDedup(emb).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rows(0L) === Some(1.0))
    assert(rows(5L) === Some(1.0))
  }

  test("semDedup: result is invariant under input partitioning") {
    val a = Similarity.semDedup(emb).collect().map(_.toString).sorted
    val b = Similarity.semDedup(emb.repartition(7)).collect()
      .map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("semanticDecontaminate: a train-side clone of an eval vector " +
      "flags with cosine 1.0 pointing at its source; orthogonal stays clean") {
    // eval set = vec_id < 20. Train: 100 clones eval 3's direction,
    // 101 is orthogonal to everything in eval.
    val emb2 = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (3L, Array(0f, 0f, 1f, 0f), 0),
      (100L, Array(0f, 0f, 2f, 0f), 1),  // same direction as eval 3
      (101L, Array(0f, 0f, 0f, 1f), 1))  // orthogonal to eval
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semanticDecontaminate(emb2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(100L, 101L))
    assert(out(100L).getAs[Double]("max_eval_cosine") === 1.0)
    assert(out(100L).getAs[Long]("near_eval_id") === 3L)
    assert(out(100L).getAs[Boolean]("flagged"))
    assert(!out(101L).getAs[Boolean]("flagged"))
    assert(out(101L).getAs[Double]("max_eval_cosine") === 0.0)
  }
}
