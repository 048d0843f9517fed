package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.operators.{Curation, Relational}

/** Ordered-sequence funnel semantics on a hand-built fixture: stage
  * order must be strict (a click BEFORE the first view does not count),
  * and conversion ratios derive from the stage-1 population. Plus
  * mixture-plan invariants: tempering compresses shares toward uniform
  * and the tempered shares renormalize to 1. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, typ: String, t: String) =
    (id, Timestamp.valueOf(t), user, typ, 1.0, "{}")

  private def events(rows: (Long, Timestamp, Long, String, Double, String)*): DataFrame =
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("funnel: strict view -> click -> purchase ordering per user") {
    val d = events(
      // user 1: full chain in order
      ev(1, 1, "view", "2024-01-01 00:00:00"),
      ev(2, 1, "click", "2024-01-01 00:01:00"),
      ev(3, 1, "purchase", "2024-01-01 00:02:00"),
      // user 2: click BEFORE the first view -> never reaches stage 2
      ev(4, 2, "click", "2024-01-01 00:00:00"),
      ev(5, 2, "view", "2024-01-01 00:01:00"),
      ev(6, 2, "purchase", "2024-01-01 00:02:00"),
      // user 3: view only
      ev(7, 3, "view", "2024-01-01 00:00:00"),
      // user 4: no view at all -> not in the funnel base
      ev(8, 4, "purchase", "2024-01-01 00:00:00"))
    val out = Relational.funnelOn(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      ("1_view", 3L, 1.0),
      ("2_click", 1L, 0.333333),
      ("3_purchase", 1L, 0.333333)))
  }

  test("funnel: simultaneous timestamps break ties by event_id") {
    // click shares the view's timestamp but has a HIGHER event id ->
    // (ts, id) tuple compare says it is 'after' -> chain completes
    val after = events(
      ev(1, 1, "view", "2024-01-01 00:00:00"),
      ev(2, 1, "click", "2024-01-01 00:00:00"),
      ev(3, 1, "purchase", "2024-01-01 00:01:00"))
    assert(Relational.funnelOn(after).collect().map(_.getLong(1)).toSeq ===
      Seq(1L, 1L, 1L))
    // same instant but LOWER event id -> 'before' -> chain stops
    val before = events(
      ev(5, 1, "view", "2024-01-01 00:00:00"),
      ev(2, 1, "click", "2024-01-01 00:00:00"),
      ev(9, 1, "purchase", "2024-01-01 00:01:00"))
    assert(Relational.funnelOn(before).collect().map(_.getLong(1)).toSeq ===
      Seq(1L, 0L, 0L))
  }

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.toSeq.map { case (id, lang, t) => (id, t, lang, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("mixturePlan: sqrt tempering upsamples the tail, damps the head, " +
      "and tempered shares renormalize to 1") {
    // lang a: 9 tokens x 10 docs = 90; lang b: 10 tokens total
    val d = docs(
      (1L to 10L).map(i => (i, "a", "t1 t2 t3 t4 t5 t6 t7 t8 t9")) :+
        ((11L, "b", "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")): _*)
    val out = Curation.mixturePlan(d).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val (shareA, tempA, facA) = out("a")
    val (shareB, tempB, facB) = out("b")
    assert(shareA === 0.9 && shareB === 0.1)
    assert(math.abs(tempA + tempB - 1.0) < 2e-6)
    assert(facA < 1.0, "head language is downsampled")
    assert(facB > 1.0, "tail language is upsampled")
    // hand math: tw = (sqrt(.9), sqrt(.1)), z = sum -> .75/.25
    assert(math.abs(tempA - 0.75) < 1e-6 && math.abs(tempB - 0.25) < 1e-6)
  }
}
