package graft.operators

import org.apache.spark.sql.{DataFrame, GraftGlue}
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
import org.apache.spark.sql.types.IntegerType

import graft.plans.GroupedTopK

/** DataFrame API over the [[graft.plans.GroupedTopK]] custom operator:
  * `perKey(df, keys, order, k)` ≡
  * `row_number() OVER (PARTITION BY keys ORDER BY order) <= k`, planned
  * as a bounded per-key heap instead of WindowExec's full partition
  * sort. Requires [[graft.GraftExtensions]] on the session (all engine
  * entry points install it).
  *
  * Expressions are resolved here against the analyzed child plan (by
  * column name) — Spark 4's lazy Column nodes don't resolve inside
  * foreign logical nodes, so the node is built fully resolved.
  *
  * Null caveat: order columns should be non-null. Spark's default null
  * order (ASC⇒NULLS FIRST) differs from DuckDB's (NULLS LAST), so an
  * oracle-paired query ordering on a nullable column must state the
  * null order explicitly on both sides. */
object TopK {

  /** @param orderBy (column, descending?) pairs. */
  def perKey(df: DataFrame, partitionCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int,
      rankCol: String = "rn"): DataFrame = {
    require(k > 0, s"TopK.perKey: k must be positive, got $k")
    require(partitionCols.nonEmpty,
      "TopK.perKey: partition keys must be non-empty (use orderBy().limit() for global top-k)")
    val analyzed = df.queryExecution.analyzed
    def attr(name: String) = analyzed.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"TopK.perKey: no column '$name' in ${analyzed.output.map(_.name)}"))
    val part = partitionCols.map(attr)
    val order = orderBy.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    val rnAttr = AttributeReference(rankCol, IntegerType, nullable = false)()
    GraftGlue.ofRows(df.sparkSession,
      GroupedTopK(part, order, k, rnAttr, analyzed))
  }
}
