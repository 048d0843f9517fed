package graft

import java.util.regex.Matcher

import org.apache.spark.sql.{DataFrame, SparkSession}

/** BigQuery-dialect compatibility shim for the reference's query corpus
  * (`/root/reference/README.md:671-795`, `frontend-app/app.py:28-95`) —
  * a reference user pastes their dashboard SQL unchanged and it runs on
  * this engine:
  *
  *   - `` `project.dataset.table` `` backtick paths → mapped (or
  *     last-segment) view names;
  *   - `TIMESTAMP_SUB(x, INTERVAL n unit)` → `(x - INTERVAL n unit)`;
  *   - `CURRENT_TIMESTAMP()` → an injected deterministic clock
  *     expression when provided (the engine's reproducibility contract);
  *   - `QUALIFY <pred>` → filtered subquery (OSS Spark SQL has no
  *     QUALIFY). The rewritten `ROW_NUMBER() OVER (...) = 1` pattern is
  *     then lowered by [[graft.plans.RowNumberTopKRewrite]] to the
  *     bounded-heap GroupedTopK operator — reference SQL in, custom
  *     physical operator out, no user change.
  *
  * This is a CORPUS shim, not a general BigQuery parser: it handles the
  * reference's query shapes (one top-level SELECT — optionally under a
  * WITH clause, whose CTE bodies sit at paren depth > 0 and are
  * untouched by the top-level scan (GraftSqlSpec proves the combined
  * WITH + QUALIFY path) — plain select list, one QUALIFY clause).
  * Out-of-corpus SQL passes through untouched except for the lexical
  * rewrites above. */
object GraftSql {

  def rewrite(query: String, tableMap: Map[String, String] = Map.empty,
      now: Option[String] = None): String = {
    // lexical rewrites apply OUTSIDE single-quoted string literals only
    // — a literal that happens to contain `TIMESTAMP_SUB(...)`,
    // CURRENT_TIMESTAMP() or a backtick path must survive byte-for-byte
    var q = mapNonLiteral(query.trim.stripSuffix(";")) { seg =>
      var t = "`([^`]+)`".r.replaceAllIn(seg, m => {
        val full = m.group(1)
        Matcher.quoteReplacement(
          tableMap.getOrElse(full, full.split('.').last))
      })
      t = "(?i)TIMESTAMP_SUB\\(\\s*([^,]*\\([^)]*\\)[^,]*|[^,]+),\\s*INTERVAL\\s+(\\d+)\\s+(\\w+)\\s*\\)".r
        .replaceAllIn(t, m => Matcher.quoteReplacement(
          s"(${m.group(1).trim} - INTERVAL ${m.group(2)} ${m.group(3)})"))
      now.foreach { n =>
        t = "(?i)CURRENT_TIMESTAMP\\(\\)".r
          .replaceAllIn(t, Matcher.quoteReplacement(s"($n)"))
      }
      t
    }
    // keyword scan runs on a literal-MASKED copy (same length, literal
    // bytes blanked) so a FROM/QUALIFY/ORDER inside a string can never
    // steer the split; substrings are taken from the real text
    val masked = maskLiterals(q)
    val qi = topLevelIndex(masked, "QUALIFY")
    if (qi < 0) q
    else {
      val fi = topLevelIndex(masked, "FROM")
      require(fi >= 0 && fi < qi, "QUALIFY without a top-level FROM")
      val sel = q.substring(0, fi).trim
      val rest = q.substring(fi + "FROM".length, qi).trim
      val afterQ = q.substring(qi + "QUALIFY".length)
      val maskedAfterQ = masked.substring(qi + "QUALIFY".length)
      // the predicate ends at the first TOP-LEVEL ORDER/LIMIT (an ORDER
      // BY inside OVER (...) sits at paren depth > 0 and is skipped)
      val end = Seq(topLevelIndex(maskedAfterQ, "ORDER"),
          topLevelIndex(maskedAfterQ, "LIMIT"))
        .filter(_ >= 0).sorted.headOption.getOrElse(afterQ.length)
      val pred = afterQ.substring(0, end).trim
      val tail = afterQ.substring(end).trim
      s"$sel FROM (SELECT *, ($pred) AS __keep FROM $rest) WHERE __keep $tail"
    }
  }

  /** Apply `f` to the maximal non-literal segments of `s`, passing
    * single-quoted literals (with `''` escapes) through untouched. */
  private def mapNonLiteral(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        out ++= f(seg.toString()); seg.clear()
        val close = literalEnd(s, i)
        out ++= s.substring(i, close)
        i = close
      } else { seg += s.charAt(i); i += 1 }
    }
    out ++= f(seg.toString())
    out.toString()
  }

  /** End index (exclusive) of the literal opening at `start`; an
    * unterminated literal runs to end-of-string (the engine passes it
    * through for the SQL parser to reject). */
  private def literalEnd(s: String, start: Int): Int = {
    var i = start + 1
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2 // escape
        else return i + 1
      } else i += 1
    }
    s.length
  }

  /** Same-length copy with every string literal (quotes included)
    * blanked to spaces, so index math on the original stays valid. */
  private def maskLiterals(s: String): String = {
    val out = s.toCharArray
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        val close = literalEnd(s, i)
        java.util.Arrays.fill(out, i, close, ' ')
        i = close
      } else i += 1
    }
    new String(out)
  }

  /** Index of keyword `kw` at paren depth 0 with word boundaries, -1 if
    * absent. Case-insensitive. Callers pass the literal-masked text. */
  private def topLevelIndex(s: String, kw: String): Int = {
    val upper = s.toUpperCase
    val k = kw.toUpperCase
    def isWord(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    var depth = 0
    var i = 0
    while (i <= s.length - k.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && upper.startsWith(k, i) &&
          (i == 0 || !isWord(s.charAt(i - 1))) &&
          (i + k.length == s.length || !isWord(s.charAt(i + k.length))))
        return i
      i += 1
    }
    -1
  }

  /** Run a reference-dialect query on the session (views must exist). */
  def sql(spark: SparkSession, query: String,
      tableMap: Map[String, String] = Map.empty,
      now: Option[String] = None): DataFrame =
    spark.sql(rewrite(query, tableMap, now))
}
