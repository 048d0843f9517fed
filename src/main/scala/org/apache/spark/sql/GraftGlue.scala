package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal glue to lift custom Catalyst expressions into the public
  * Column API — `ExpressionUtils` is private[sql] in Spark 4's classic
  * module, so the bridge lives in this package (the standard pattern for
  * Catalyst extension libraries). */
object GraftGlue {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame / unwrap one (Dataset.ofRows and
    * Dataset.logicalPlan are private[sql]). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def logicalPlan(df: Dataset[_])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan
}
