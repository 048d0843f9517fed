package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Materialize.PinOps

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

  /** Hot/cold split inner equi-join for an UNBOUNDED small side (e.g. a
    * vocabulary table): the `hotK` keys with the largest `weight`
    * broadcast — a bounded build side no matter how far the vocab grows,
    * where `broadcast(small)` would blow the 8 GB ceiling on a web
    * corpus — and the long tail shuffle-joins, safe because a text
    * corpus's skew mass (the "the"-grade keys that would melt one
    * shuffle task) travels with the broadcast branch by construction.
    * Hot and cold partition `small` on the join key, so the union is
    * row-for-row the plain inner join; Spark's ReuseExchange dedupes the
    * shared `small` aggregation between the two branches. `hotK` is a
    * pure performance knob — any value gives identical results. */
  def hotColdJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      weight: Column, hotK: Int): DataFrame = {
    // materialize the small side once (it is vocab-sized — orders of
    // magnitude under the corpus): hot, anti-join, and cold all derive
    // from it, and without this the aggregate subtree is planned three
    // times (AQE stage reuse is best-effort, not guaranteed)
    val s = small.pin(eager = true)
    val hot = s.orderBy(weight.desc +: keys.map(col(_).asc): _*)
      .limit(hotK) // TakeOrderedAndProject: no global sort
    val cold = s.join(broadcast(hot.select(keys.map(col): _*)),
      keys, "left_anti")
    large.join(broadcast(hot), keys)
      .unionByName(large.join(cold, keys))
  }
}
