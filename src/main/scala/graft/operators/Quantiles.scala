package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles WITHOUT the `percentile` aggregate.
  *
  * Spark's `percentile` is a TypedImperativeAggregate whose buffer is a
  * value→count map over every DISTINCT value of the column, merged on a
  * single reducer per group — an OOM once the distinct-value space
  * outgrows one executor. This helper computes the same boundaries
  * (bit-identical: it restates Percentile's interpolation term-for-term
  * — position p·(n−1), lowerKey when floor==ceil or the two keys
  * collide, else (ceil−pos)·lowerKey + (pos−floor)·higherKey) from the
  * distributed distinct-value aggregate instead:
  *
  *   1. groupBy(g, v) → count: a partial-aggregated shuffle of
  *      O(distinct) slim rows — never concentrated on one task;
  *   2. cumulative 0-based index ranges via the same two-level band
  *      scan as [[Packing.packAssign]] (equal-width value bands from a
  *      per-group min/max aggregate, per-(group, band) windows +
  *      per-group band offsets — no window ever spans more than one
  *      band of one group);
  *   3. each requested percentile's two index probes are resolved
  *      MAP-SIDE: `ps` is a literal array, and the group's row count
  *      rides every cumulative row, so each row tests its own index
  *      range against the |ps| positions it can compute locally — a
  *      posexplode + filter, no join shape at all. (An earlier form
  *      used a broadcast-inequality join here; on the UNGROUPED path
  *      the constant group key folded away and left a non-equi
  *      BroadcastNestedLoopJoin — the exact plan shape PlanAuditSpec
  *      exists to catch.)
  *
  * Worst case (every value distinct) this is an ordinary shuffle of
  * n slim rows across the cluster, which is exactly what the
  * one-buffer-per-group aggregate cannot do. */
object Quantiles {

  /** One-row DataFrame with column `bs`: `array<double>` of the exact
    * interpolated percentiles of `values`' column `v`, in `ps` order
    * (1-indexed by `element_at`). Null values are skipped, matching the
    * `percentile` aggregate. `ps` must be literal fractions in [0, 1]. */
  private[operators] def exactPercentiles(values: DataFrame,
      ps: Seq[Double], nBands: Int = 128): DataFrame =
    exactPercentilesBy(values, Seq.empty, ps, nBands)

  /** Grouped form: one row per distinct `groupCols` combination, column
    * `bs` as in [[exactPercentiles]]. Groups whose `v` is all-null are
    * absent from the output (the `percentile` aggregate would return a
    * null — callers join back with the group table if they need the
    * distinction). The band-offsets window runs over the O(groups ×
    * nBands) partials partitioned BY GROUP, and the cumulative window
    * over one (group, band) at a time — partition sizes are
    * O(distinct/nBands), corpus-size-independent when the value domain
    * is bounded and an ordinary slim shuffle when it is not.
    *
    * `groupCols` empty = the global form: the per-group broadcast
    * attachments become explicit cross-joins of the ONE-ROW min/max/n
    * aggregate (the intended bounded-broadcast pattern; a synthetic
    * constant key would constant-fold into a non-equi nested loop). */
  private[operators] def exactPercentilesBy(values: DataFrame,
      groupCols: Seq[String], ps: Seq[Double],
      nBands: Int = 128): DataFrame = {
    val g = groupCols.map(col)
    // Per-group one-row attachments: broadcast equi-join on the group
    // keys; with no groups the right side IS one row — explicit cross.
    def attach(l: DataFrame, r: DataFrame): DataFrame =
      if (groupCols.isEmpty) l.crossJoin(broadcast(r))
      else l.join(broadcast(r), groupCols)
    val pc = values.filter(col("v").isNotNull)
      .groupBy(g :+ col("v"): _*).agg(count(lit(1)).as("c"))
    // group extrema + total count in ONE aggregate over the slim
    // distinct-value table (lo/hi drive the banding, n the positions)
    val mm = pc.groupBy(g: _*)
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        sum(col("c")).as("n"))
    // equal-width value bands (the priceHistogram formula: monotone in
    // v, so band order IS value order; degenerate hi==lo → band 0)
    val banded = attach(pc, mm)
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0L)).otherwise(least(
          floor((col("v") - col("lo")) / (col("hi") - col("lo")) * nBands),
          lit(nBands - 1L)).cast("long")))
      .select(g ++ Seq(col("v"), col("c"), col("n"), col("bucket")): _*)
    // per-group exclusive band prefix: O(groups × nBands) slim rows
    val wo = Window.partitionBy(g: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = banded.groupBy(g :+ col("bucket"): _*)
      .agg(sum(col("c")).as("part"))
      .withColumn("offset", coalesce(sum(col("part")).over(wo), lit(0L)))
      .select(g ++ Seq(col("bucket"), col("offset")): _*)
    val wb = Window.partitionBy(g :+ col("bucket"): _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // 0-based index range [cum_lo, cum_hi) of each distinct value in
    // the group's value-sorted order ("bucket" is a genuine equi key
    // on both paths, so this never degrades to a nested loop)
    val cum = banded.join(broadcast(offsets), groupCols :+ "bucket")
      .select(g ++ Seq(col("v"), col("n"),
        (col("offset") + sum(col("c")).over(wb) - col("c")).as("cum_lo"),
        (col("offset") + sum(col("c")).over(wb)).as("cum_hi")): _*)
    // map-side probe resolution: each cum row expands to the |ps|
    // literal percentiles, computes their positions from its own n,
    // and keeps only the probes its index range answers — O(distinct ×
    // |ps|) generated rows, filtered before the tiny final aggregate
    val probed = cum
      .select(g ++ Seq(col("v"), col("n"), col("cum_lo"), col("cum_hi"),
        posexplode(array(ps.map(lit(_)): _*)).as(Seq("pi", "p"))): _*)
      .withColumn("pos", col("p") * (col("n") - 1).cast("double"))
      .withColumn("lo_idx", floor(col("pos")).cast("long"))
      .withColumn("hi_idx", ceil(col("pos")).cast("long"))
      .withColumn("lo_in",
        col("lo_idx") >= col("cum_lo") && col("lo_idx") < col("cum_hi"))
      .withColumn("hi_in",
        col("hi_idx") >= col("cum_lo") && col("hi_idx") < col("cum_hi"))
      .filter(col("lo_in") || col("hi_in"))
    // ≤ 2 rows per (group, percentile) survive; lk/hk may come from
    // the same row (both indexes in range) or two adjacent ones
    val keys = probed
      .groupBy(g ++ Seq((col("pi") + 1).as("i"), col("pos"),
        col("lo_idx"), col("hi_idx")): _*)
      .agg(max(when(col("lo_in"), col("v"))).as("lk"),
        max(when(col("hi_in"), col("v"))).as("hk"))
    val bval = when(col("hi_idx") === col("lo_idx"), col("lk"))
      .when(col("hk") === col("lk"), col("lk"))
      .otherwise(
        (col("hi_idx").cast("double") - col("pos")) * col("lk") +
          (col("pos") - col("lo_idx").cast("double")) * col("hk"))
    keys.select(g ++ Seq(col("i"), bval.cast("double").as("b")): _*)
      .groupBy(g: _*)
      .agg(transform(array_sort(collect_list(struct(col("i"), col("b")))),
        x => x.getField("b")).as("bs"))
      // Empty/all-null input: the grouped path has no groups, but the
      // UNGROUPED global aggregate emits one row with bs = [] — and a
      // caller's element_at(bs, i) would then yield null (or throw
      // under ANSI mode) instead of the empty join the contract
      // promises. Dropping the empty row restores "no input → no rows"
      // on both paths; non-empty inputs always carry a non-empty bs.
      .filter(size(col("bs")) > 0)
  }
}
