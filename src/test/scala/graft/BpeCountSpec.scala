package graft

import org.apache.spark.sql.functions._

import graft.functions.{BpeCountImpl, BpeExprs}
import org.apache.spark.unsafe.types.UTF8String

/** Semantics of the greedy merge-table subword counter: hand-checked
  * piece counts, longest-match-wins, whitespace as a zero-piece
  * separator, code-point (not byte) counting for unmatched runs, and
  * whole-text == per-token-sum equivalence (what makes the DuckDB
  * per-token fold a valid oracle for the whole-text scan). */
class BpeCountSpec extends SparkSpec {
  import spark.implicits._

  private def cnt(s: String): Long = BpeCountImpl.count(UTF8String.fromString(s))

  test("hand-checked greedy segmentations") {
    // "the" matches as one 3-char piece, not t|h|e
    assert(cnt("the") === 1L)
    // "nation" -> "n" + "ation"? greedy at pos 0: no vocab starts the
    // word ("na" not in vocab) -> "n", then "ation": "at"? "ati" not in
    // vocab; longest at pos 1 is "ati"? no — check: "tion" needs pos 2.
    // pos1: "at" matches (len 2) -> leaves "ion" which matches (len 3).
    // n|at|ion = 3 pieces
    assert(cnt("nation") === 3L)
    // "sting": "st" + "ing" = 2
    assert(cnt("sting") === 2L)
    // "xyz": no matches, 3 single chars
    assert(cnt("xyz") === 3L)
    // longest-first: "tion" (4) beats "ti" (2) at the same position
    assert(cnt("tion") === 1L)
    // "ingestion": "ing" + "es" + "tion" = 3
    assert(cnt("ingestion") === 3L)
  }

  test("whitespace separates and never counts; empty and blank are zero") {
    assert(cnt("") === 0L)
    assert(cnt("   \t\n") === 0L)
    assert(cnt("the the") === 2L)
    assert(cnt("  the\tthe\n") === 2L)
  }

  test("unmatched runs count code points, not bytes") {
    // 2-byte UTF-8 chars: 3 code points = 3 pieces
    assert(cnt("ééé") === 3L)
    // 3-byte char adjacent to a vocab match
    assert(cnt("the€") === 2L)
  }

  test("whole-text scan equals the per-token sum (the oracle's form)") {
    val texts = Seq("the nation of stings", "  mixed\tws\n tion ",
      "punctuation, and; spacing!", "école the €100")
    texts.foreach { t =>
      val tokens = t.trim.split("\\s+").toSeq.filter(_ => true)
      val perTok = tokens.map(cnt).sum
      assert(cnt(t) === perTok, s"text: '$t'")
    }
  }

  test("the column expression matches the impl and survives codegen") {
    val df = Seq((1L, "the nation"), (2L, "xyz"), (3L, ""))
      .toDF("id", "text")
    val rows = df.select(col("id"), BpeExprs.bpeCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(1L -> 4L, 2L -> 3L, 3L -> 0L))
    // null propagates
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(BpeExprs.bpeCount(col("text"))).head()
    assert(n.isNullAt(0))
  }

  test("bpeMerges: hand-counted adjacent-pair frequencies, boundary rules") {
    val docs = Seq((1L, "aaab aab", "en", "src0", 8L), (2L, "x ab", "en", "src0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // pairs: "aaab" -> aa,aa,ab; "aab" -> aa,ab; "x" -> none (1-char);
    // "ab" -> ab. Totals: aa:3, ab:3 (freq tie -> pair asc)
    val got = graft.operators.TextAnalysis.bpeMerges(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got === Seq("aa" -> 3L, "ab" -> 3L))
  }

  test("vocab ordering invariant: longest-first, asc within a length") {
    val v = BpeCountImpl.vocab
    val sorted = v.sortBy(w => (-w.length, w))
    assert(v === sorted, "merge table must stay longest-first (greedy)")
    assert(v.distinct === v)
    assert(v.forall(w => w.forall(c => c >= 'a' && c <= 'z')),
      "vocab must stay pure ASCII lowercase (byte-level match safety)")
  }
}
