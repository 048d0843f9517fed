package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

/** Independent completeness certificate for the deletion-neighborhood
  * (FastSS) blocking in [[Relational.fuzzyPairsOf]] — round-10 advice:
  * the DuckDB oracles for rel_fuzzy_names/rel_entity_groups now state
  * the SAME blocking (the quadratic form was infeasible at sf1), so
  * oracle hash equality alone no longer proves the blocking loses
  * nothing. This spec restores the independent proof at small scale:
  * the blocked pairs must equal the naive all-pairs
  * `levenshtein(a,b) = 1` join on real names at two scale factors,
  * and on an adversarial fixture exercising every edit class the
  * blocking decomposes (substitution / insert / delete, distance-2
  * near-misses that must NOT pair, transpositions = distance 2,
  * single-char names, shared-deletion buckets of size > 2). */
class FuzzyBlockingSpec extends SparkSpec {

  private def quadratic(names: org.apache.spark.sql.DataFrame) =
    names.select(col("name").as("name_a"))
      .join(names.select(col("name").as("name_b")),
        levenshtein(col("name_a"), col("name_b")) === 1 &&
          col("name_a") < col("name_b"))
      .orderBy(col("name_a"), col("name_b"))

  private def assertSame(raw: org.apache.spark.sql.DataFrame): Unit = {
    val names = raw.distinct()
    val blocked = Relational.fuzzyPairsOf(names).collect()
    val quad = quadratic(names).collect()
    assert(blocked.length === quad.length,
      s"blocked ${blocked.length} pairs vs quadratic ${quad.length}")
    blocked.zip(quad).foreach { case (b, q) =>
      assert(b.toSeq === q.toSeq, s"blocked $b vs quadratic $q")
    }
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"blocked fuzzy pairs == quadratic levenshtein=1 pairs on $dir") {
      assertSame(Tables.customer(spark, dir)
        .select(col("c_name").as("name")))
    }
  }

  test("blocked fuzzy pairs == quadratic on an adversarial edit-class " +
      "fixture") {
    import spark.implicits._
    val names = Seq(
      "alpha", "alpho",            // substitution (last char)
      "blpha", "aalpha", "alpha1", // substitution (first), insert ×2
      "alph", "lpha",              // deletions (end, start)
      "alhpa",                     // transposition = distance 2: no pair
      "axpho",                     // distance 2 from alpha via alpho
      "a", "b", "ab",              // single-char names: a-b pair, ab±1
      "zz", "zzz", "zzzz"          // an insert CHAIN: consecutive pairs
    ).toDF("name")
    assertSame(names)
    // the fixture must actually exercise a non-trivial pair set
    val got = Relational.fuzzyPairsOf(names).collect()
    assert(got.length >= 8, s"fixture too weak: ${got.length} pairs")
    // and the distance-2 decoys must be absent
    val flat = got.map(r => (r.getString(0), r.getString(1))).toSet
    assert(!flat.contains(("alhpa", "alpha")) &&
      !flat.contains(("alpha", "alhpa")), "transposition wrongly paired")
  }
}
