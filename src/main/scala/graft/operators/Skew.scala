package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY.md §4 / the 100 TB contract).
  *
  * A shuffled equi-join on a skewed key sends every row of the hot key
  * to one task. Salting splits each hot key's rows across `nSalts`
  * tasks: the large side gets a deterministic salt derived from one of
  * its unique columns, the small side is replicated once per salt, and
  * the join key becomes (key, salt). Equivalent rows, `nSalts`-way
  * parallelism on the hot keys.
  *
  * At runtime Spark's AQE skew-join handles moderate skew transparently
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); explicit
  * salting is the plan-level tool for the pathological cases AQE can't
  * split (e.g. a single key larger than an executor's memory on the
  * build side of a broadcast, or stateful streaming joins where AQE
  * doesn't apply).
  */
object Skew {

  /** Salted inner equi-join. `saltBy` must be deterministic per row of
    * `large` (any unique/high-cardinality column, e.g. its primary key);
    * `small` is replicated `nSalts` times. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltBy: Column, nSalts: Int): DataFrame = {
    val salted = large.withColumn("__salt", pmod(hash(saltBy), lit(nSalts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
