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
  *   3. each requested percentile is two O(1) index probes resolved by
  *      ONE broadcast-inequality join over the cumulative table.
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
    exactPercentilesBy(values.withColumn("__g", lit(0)), Seq("__g"), ps,
      nBands).drop("__g")

  /** Grouped form: one row per distinct `groupCols` combination, column
    * `bs` as in [[exactPercentiles]]. Groups whose `v` is all-null are
    * absent from the output (the `percentile` aggregate would return a
    * null — callers join back with the group table if they need the
    * distinction). The band-offsets window runs over the O(groups ×
    * nBands) partials partitioned BY GROUP, and the cumulative window
    * over one (group, band) at a time — partition sizes are
    * O(distinct/nBands), corpus-size-independent when the value domain
    * is bounded and an ordinary slim shuffle when it is not. */
  private[operators] def exactPercentilesBy(values: DataFrame,
      groupCols: Seq[String], ps: Seq[Double],
      nBands: Int = 128): DataFrame = {
    val spark = values.sparkSession
    val g = groupCols.map(col)
    val pc = values.filter(col("v").isNotNull)
      .groupBy(g :+ col("v"): _*).agg(count(lit(1)).as("c"))
    // equal-width value bands (the priceHistogram formula: monotone in
    // v, so band order IS value order; degenerate hi==lo → band 0)
    val mm = pc.groupBy(g: _*)
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val banded = pc.join(broadcast(mm), groupCols)
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0L)).otherwise(least(
          floor((col("v") - col("lo")) / (col("hi") - col("lo")) * nBands),
          lit(nBands - 1L)).cast("long")))
      .select(g ++ Seq(col("v"), col("c"), col("bucket")): _*)
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
    // the group's value-sorted order
    val cum = banded.join(broadcast(offsets), groupCols :+ "bucket")
      .select(g ++ Seq(col("v"),
        (col("offset") + sum(col("c")).over(wb) - col("c")).as("cum_lo"),
        (col("offset") + sum(col("c")).over(wb)).as("cum_hi")): _*)
    val total = pc.groupBy(g: _*).agg(sum(col("c")).as("n"))
    // |ps| target positions per group → 2·|ps| (boundary, lo/hi) index
    // probes, long-form so ONE broadcast-inequality join resolves every
    // lookup in a single pass over the O(distinct) cumulative table
    import spark.implicits._
    val targets = ps.zipWithIndex
      .map { case (p, i) => (i + 1L, p) }.toDF("i", "p")
      .crossJoin(total)
      .select(g ++ Seq(col("i"),
        (col("p") * (col("n") - 1).cast("double")).as("pos")): _*)
      .select(g ++ Seq(col("i"), col("pos"),
        floor(col("pos")).cast("long").as("lo_idx"),
        ceil(col("pos")).cast("long").as("hi_idx")): _*)
    val probes = targets
      .select(g ++ Seq(col("i"), col("pos"), col("lo_idx"), col("hi_idx"),
        explode(array(
          struct(lit("lo").as("kind"), col("lo_idx").as("idx")),
          struct(lit("hi").as("kind"), col("hi_idx").as("idx")))).as("t")): _*)
      .select(g ++ Seq(col("i"), col("pos"), col("lo_idx"), col("hi_idx"),
        col("t.kind").as("kind"), col("t.idx").as("idx")): _*)
    val keys = cum.as("c").join(broadcast(probes.as("p")),
        groupCols.map(k => col(s"c.$k") === col(s"p.$k"))
          .reduce(_ && _) &&
          col("c.cum_lo") <= col("p.idx") && col("p.idx") < col("c.cum_hi"))
      .groupBy(groupCols.map(k => col(s"p.$k").as(k)) ++
        Seq(col("i"), col("pos"), col("lo_idx"), col("hi_idx")): _*)
      .agg(max(when(col("kind") === "lo", col("v"))).as("lk"),
        max(when(col("kind") === "hi", col("v"))).as("hk"))
    val bval = when(col("hi_idx") === col("lo_idx"), col("lk"))
      .when(col("hk") === col("lk"), col("lk"))
      .otherwise(
        (col("hi_idx").cast("double") - col("pos")) * col("lk") +
          (col("pos") - col("lo_idx").cast("double")) * col("hk"))
    keys.select(g ++ Seq(col("i"), bval.cast("double").as("b")): _*)
      .groupBy(g: _*)
      .agg(transform(array_sort(collect_list(struct(col("i"), col("b")))),
        x => x.getField("b")).as("bs"))
  }
}
