package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal glue to lift custom Catalyst expressions into the public
  * Column API — `ExpressionUtils` is private[sql] in Spark 4's classic
  * module, so the bridge lives in this package (the standard pattern for
  * Catalyst extension libraries). */
object GraftGlue {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
