package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic BPE-style subword counting: greedy longest-match over a
  * fixed literal merge table ([[BpeCountImpl.vocab]]), one piece per
  * match, one piece per unmatched code point, whitespace consumed as a
  * separator (zero pieces). This is the tokenizer-aware token count a
  * training pipeline budgets in — whitespace counts undercount code/CJK
  * and overcount hyphenated prose.
  *
  * The scan is byte-level over the UTF-8 payload (the vocab is pure
  * ASCII, so a match can never start or end inside a multi-byte
  * sequence) and counts one piece per unmatched CODE POINT (continuation
  * bytes are skipped), matching the DuckDB oracle's character-indexed
  * `substr` fold exactly. The whitespace set is the regex `\s` set the
  * tokenizer splits on, so per-token fold totals and the whole-text scan
  * agree by construction.
  *
  * Implemented as a native expression (one static call inside
  * whole-stage codegen) rather than an `aggregate` HOF fold — the HOF
  * form is CodegenFallback and pays an interpreted lambda per character.
  */
case class BpeCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_count expects string, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    BpeCountImpl.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCountImpl.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCountImpl {

  /** The merge table: literal ASCII subwords tried longest-first (asc
    * within a length — the exact order the oracle's CASE chain states).
    * Fixed forever: changing it silently re-prices every token budget. */
  val vocab: Seq[String] = Seq(
    "tion",
    "and", "ent", "ing", "ion", "the",
    "al", "an", "ar", "at", "ed", "en", "er", "es", "in", "is", "it",
    "on", "or", "ou", "re", "st", "te", "th", "ti")

  private val vocabBytes: Array[Array[Byte]] =
    vocab.map(_.getBytes("UTF-8")).toArray

  /** The regex `\s` set ([[Portable.tokens]]' separator class): space,
    * tab, LF, VT, FF, CR — all single ASCII bytes. */
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Greedy piece count — called from generated code (static
    * forwarder), so the expression stays inside whole-stage codegen. */
  def count(s: UTF8String): Long = {
    val n = s.numBytes()
    var i = 0
    var pieces = 0L
    while (i < n) {
      val b = s.getByte(i)
      if (isWs(b)) {
        i += 1
      } else {
        var matched = -1
        var v = 0
        while (matched < 0 && v < vocabBytes.length) {
          val w = vocabBytes(v)
          if (i + w.length <= n) {
            var j = 0
            while (j < w.length && s.getByte(i + j) == w(j)) j += 1
            if (j == w.length) matched = w.length
          }
          v += 1
        }
        if (matched > 0) {
          i += matched
        } else {
          // one unmatched code point: lead byte + continuation bytes
          i += 1
          while (i < n && (s.getByte(i) & 0xC0) == 0x80) i += 1
        }
        pieces += 1L
      }
    }
    pieces
  }
}

object BpeExprs {
  /** Column API for [[BpeCount]]. */
  def bpeCount(c: Column): Column =
    GraftGlue.toColumn(BpeCount(GraftGlue.toExpression(c)))
}
