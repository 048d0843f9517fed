package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles WITHOUT the `percentile` aggregate.
  *
  * Spark's `percentile` is a TypedImperativeAggregate whose buffer
  * holds every raw value and merges on a single reducer — an OOM once
  * the column outgrows one executor. This helper computes the same
  * boundaries (bit-identical: it restates Percentile's interpolation
  * term-for-term — position p·(n−1), lowerKey when floor==ceil or the
  * two keys collide, else (ceil−pos)·lowerKey + (pos−floor)·higherKey)
  * from the DISTINCT-value aggregate instead:
  *
  *   1. groupBy(v) → count: a partial-aggregated shuffle of O(distinct)
  *      slim rows — never concentrated on one task;
  *   2. cumulative 0-based index ranges via the same two-level band
  *      scan as [[Packing.packAssign]] (equal-width value bands from an
  *      O(1) min/max aggregate, per-band windows + broadcast offsets —
  *      no global window, no single partition);
  *   3. each requested percentile is two O(1) index probes resolved by
  *      ONE broadcast-inequality join over the cumulative table.
  *
  * Worst case (every value distinct) this is an ordinary shuffle of
  * n slim rows across the cluster, which is exactly what the
  * one-buffer aggregate cannot do. */
object Quantiles {

  /** One-row DataFrame with column `bs`: `array<double>` of the exact
    * interpolated percentiles of `values`' column `v`, in `ps` order
    * (1-indexed by `element_at`). Null values are skipped, matching the
    * `percentile` aggregate. `ps` must be literal fractions in [0, 1]. */
  private[operators] def exactPercentiles(values: DataFrame,
      ps: Seq[Double], nBands: Int = 128): DataFrame = {
    val spark = values.sparkSession
    val pc = values.filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    // equal-width value bands (the priceHistogram formula: monotone in
    // v, so band order IS value order; degenerate hi==lo → band 0)
    val mm = pc.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val banded = pc.crossJoin(broadcast(mm))
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0L)).otherwise(least(
          floor((col("v") - col("lo")) / (col("hi") - col("lo")) * nBands),
          lit(nBands - 1L)).cast("long")))
      .select(col("v"), col("c"), col("bucket"))
    val offsets = Packing.exclusivePrefix(
      banded.groupBy(col("bucket")).agg(sum(col("c")).as("part")), "part")
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // 0-based index range [cum_lo, cum_hi) of each distinct value in
    // the value-sorted order
    val cum = banded.join(broadcast(offsets), Seq("bucket"))
      .select(col("v"),
        (col("offset") + sum(col("c")).over(wb) - col("c")).as("cum_lo"),
        (col("offset") + sum(col("c")).over(wb)).as("cum_hi"))
    val total = pc.agg(sum(col("c")).as("n"))
    // |ps| target positions → 2·|ps| (boundary, lo/hi) index probes,
    // long-form so ONE broadcast-inequality join resolves every lookup
    // in a single pass over the O(distinct) cumulative table
    import spark.implicits._
    val targets = ps.zipWithIndex
      .map { case (p, i) => (i + 1L, p) }.toDF("i", "p")
      .crossJoin(broadcast(total))
      .select(col("i"),
        (col("p") * (col("n") - 1).cast("double")).as("pos"))
      .select(col("i"), col("pos"),
        floor(col("pos")).cast("long").as("lo_idx"),
        ceil(col("pos")).cast("long").as("hi_idx"))
    val probes = targets
      .select(col("i"), col("pos"), col("lo_idx"), col("hi_idx"),
        explode(array(
          struct(lit("lo").as("kind"), col("lo_idx").as("idx")),
          struct(lit("hi").as("kind"), col("hi_idx").as("idx")))).as("t"))
      .select(col("i"), col("pos"), col("lo_idx"), col("hi_idx"),
        col("t.kind").as("kind"), col("t.idx").as("idx"))
    val keys = cum.join(broadcast(probes),
        col("cum_lo") <= col("idx") && col("idx") < col("cum_hi"))
      .groupBy(col("i"), col("pos"), col("lo_idx"), col("hi_idx"))
      .agg(max(when(col("kind") === "lo", col("v"))).as("lk"),
        max(when(col("kind") === "hi", col("v"))).as("hk"))
    val bval = when(col("hi_idx") === col("lo_idx"), col("lk"))
      .when(col("hk") === col("lk"), col("lk"))
      .otherwise(
        (col("hi_idx").cast("double") - col("pos")) * col("lk") +
          (col("pos") - col("lo_idx").cast("double")) * col("hk"))
    keys.select(col("i"), bval.as("b"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("b")))),
        x => x.getField("b")).as("bs"))
  }
}
