package graft

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
    // lexical rewrites must not fire INSIDE string literals (a literal
    // containing `TIMESTAMP_SUB(...)`, CURRENT_TIMESTAMP() or a
    // backtick path survives byte-for-byte) — but a construct whose
    // ARGUMENT contains a literal must still rewrite. So each regex
    // matches against the literal-MASKED text (same length) and the
    // replacement splices group text from the ORIGINAL at the matched
    // offsets.
    var q = query.trim.stripSuffix(";")
    q = rewriteMasked(q, "`([^`]+)`".r) { gs =>
      val full = gs.head
      tableMap.getOrElse(full, full.split('.').last)
    }
    q = rewriteMasked(q,
      "(?i)TIMESTAMP_SUB\\(\\s*([^,]*\\([^)]*\\)[^,]*|[^,]+),\\s*INTERVAL\\s+(\\d+)\\s+(\\w+)\\s*\\)".r) {
      gs => s"(${gs(0).trim} - INTERVAL ${gs(1)} ${gs(2)})"
    }
    now.foreach { n =>
      q = rewriteMasked(q, "(?i)CURRENT_TIMESTAMP\\(\\)".r)(_ => s"($n)")
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

  /** Replace every match of `re` against the literal-MASKED text,
    * splicing the replacement from group text taken at the matched
    * offsets in the ORIGINAL (mask preserves length, so offsets
    * agree) — a keyword inside a literal can't start a match, but a
    * literal inside a matched construct's argument is carried through
    * verbatim. Unmatched groups arrive as null. */
  private def rewriteMasked(q: String,
      re: scala.util.matching.Regex)(repl: List[String] => String): String = {
    val masked = maskLiterals(q)
    val out = new StringBuilder
    var last = 0
    re.findAllMatchIn(masked).foreach { m =>
      out ++= q.substring(last, m.start)
      val groups = (1 to m.groupCount).map(g =>
        if (m.start(g) < 0) null else q.substring(m.start(g), m.end(g)))
        .toList
      out ++= repl(groups)
      last = m.end
    }
    out ++= q.substring(last)
    out.toString()
  }

  /** End index (exclusive) of the literal opening at `start` with
    * quote char `qc` (doubled-quote AND backslash escapes — the
    * reference's BigQuery dialect allows both `''`/`""` and `\'`/`\"`
    * inside a literal, so a backslash consumes the next char whatever
    * it is); an unterminated literal runs to end-of-string (the engine
    * passes it through for the SQL parser to reject). */
  private def literalEnd(s: String, start: Int, qc: Char): Int = {
    var i = start + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2 // backslash escape: skip the escaped char
      else if (c == qc) {
        if (i + 1 < s.length && s.charAt(i + 1) == qc) i += 2 // escape
        else return i + 1
      } else i += 1
    }
    s.length
  }

  /** Same-length copy with every string literal (quotes included)
    * blanked to spaces, so index math on the original stays valid.
    * Both quote styles are masked: `'...'` is a string literal
    * everywhere, and `"..."` is a string in the reference's BigQuery
    * dialect (and an identifier elsewhere — masking is correct either
    * way: neither may steer the keyword scan or be rewritten). */
  private def maskLiterals(s: String): String = {
    val out = s.toCharArray
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"') {
        val close = literalEnd(s, i, c)
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
