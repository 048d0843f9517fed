package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the oracle surface against the two scale-defect idioms the
  * round-12 sf10 sweep surfaced, so the NEXT instance fails in CI
  * instead of in a 100x-scale sweep.
  *
  * (1) Direct DECIMAL→DOUBLE casts: DuckDB divides the int128 scaled
  * value in floating point — two roundings, up to 1 ULP off the
  * correctly-rounded value at ~1e12 magnitudes (an integer-exact
  * rollup sum came back x.0002). Every decimal→double hop must route
  * through VARCHAR (exact digits, then a correctly-rounded parse).
  *
  * (2) Scalar subqueries inside join predicates: DuckDB plans the
  * join as a BLOCKWISE_NL_JOIN (quadratic; stock_replay's 9M x 6M at
  * sf10 was unfinishable). Project the scalar onto one side first so
  * the join is a hash equi-join.
  *
  * These are STRING-level checks on the generated SQL — coarse by
  * design (the EXPLAIN-grade audit lives in
  * `tools/check_oracle.py --nl-audit`, which needs DuckDB) — and each
  * is self-tested on a planted offending snippet so a regex rot fails
  * loud.
  */
class OracleIdiomSpec extends AnyFunSuite {

  // DECIMAL(p,s) followed by only closing parens/whitespace before
  // AS DOUBLE — i.e. no intervening AS VARCHAR hop.
  private val directCast =
    raw"""AS\s+DECIMAL\(\d+,\s*\d+\)\)*\s*AS\s+DOUBLE""".r

  // a '(SELECT' inside the parenthesized tail of a JOIN ... ON clause,
  // scanned to the clause end (next top-level keyword or statement end)
  private def scalarSubqueryInJoinOn(sql: String): Boolean = {
    val on = raw"""JOIN\s[\s\S]*?\sON\s""".r
    on.findAllMatchIn(sql).exists { m =>
      val tail = sql.substring(m.end)
      // the ON condition extends until WHERE/GROUP/ORDER/WINDOW/closing
      // of the enclosing subquery at depth < 0, or the next JOIN
      var depth = 0
      var i = 0
      val stop = raw"""(?i)\b(WHERE|GROUP|ORDER|WINDOW|QUALIFY|JOIN|UNION)\b""".r
      val lim = stop.findFirstMatchIn(tail).map(_.start).getOrElse(tail.length)
      while (i < lim) {
        tail.charAt(i) match {
          case '(' =>
            depth += 1
            if (tail.regionMatches(true, i, "(SELECT", 0, 7)) return true
          case ')' =>
            depth -= 1
            if (depth < 0) return false
          case _ =>
        }
        i += 1
      }
      false
    }
  }

  test("the direct-cast regex catches the planted offending idiom") {
    assert(directCast.findFirstIn(
      "CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE)").isDefined)
    assert(directCast.findFirstIn(
      "CAST(round(s, 12) AS DECIMAL(28,12)) AS DOUBLE)").isDefined)
    // the VARCHAR-routed form must NOT match
    assert(directCast.findFirstIn(
      "CAST(CAST(sum(CAST(x AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)").isEmpty)
  }

  test("no oracle carries a direct DECIMAL->DOUBLE cast") {
    val bad = SparkEntry.oracleSql.filter { case (_, sql) =>
      directCast.findFirstIn(sql).isDefined
    }.keys.toSeq.sorted
    assert(bad.isEmpty, s"direct decimal->double cast in: $bad")
  }

  test("the join-predicate-subquery scan catches the planted idiom") {
    assert(scalarSubqueryInJoinOn(
      "FROM t JOIN b ON tick % (SELECT count(*) FROM events) = idx"))
    assert(!scalarSubqueryInJoinOn(
      "FROM tm JOIN b ON midx = idx WHERE x > (SELECT n FROM c)"))
  }

  test("no oracle embeds a scalar subquery in a join predicate") {
    val bad = SparkEntry.oracleSql.filter { case (_, sql) =>
      scalarSubqueryInJoinOn(sql)
    }.keys.toSeq.sorted
    assert(bad.isEmpty, s"scalar subquery inside JOIN ON in: $bad")
  }
}
