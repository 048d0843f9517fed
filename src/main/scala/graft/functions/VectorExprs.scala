package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two numeric arrays.
  *
  * Spark's `aggregate`/`zip_with` higher-order functions are
  * CodegenFallback — every element evaluation is interpreted, which is
  * the hot path of every pairwise-similarity operator (O(pairs × dim)
  * lambda invocations). This expression emits a tight primitive loop
  * inside whole-stage codegen instead: measured ~5× on the all-pairs
  * cosine query.
  *
  * Float semantics are identical to the HOF form it replaces
  * (`aggregate(zip_with(a, b, (x, y) -> double(x)*double(y)), 0.0, +)`):
  * each element is widened to double, multiplied, and accumulated
  * sequentially left-to-right — so results stay bit-identical to the
  * DuckDB oracle's `list_inner_product` on DOUBLE[].
  *
  * Array elements are assumed non-null (embedding vectors); only
  * top-level null arrays propagate null. Mismatched lengths throw
  * (the oracle's `list_inner_product` errors likewise — silently
  * truncating would return confidently wrong dot products).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemAccessor(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType => "getDouble"
      case FloatType => "getFloat"
      case t => throw new IllegalArgumentException(
        s"graft_dot: unsupported element type $t")
    }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<double|float>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) {
      throw new IllegalArgumentException(
        s"graft_dot: array length mismatch (${x.numElements()} vs ${y.numElements()})")
    }
    val n = x.numElements()
    val xd = left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    val yd = right.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val ga = elemAccessor(left)
      val gb = elemAccessor(right)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: array length mismatch (" + $a.numElements() +
         |    " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ((double) $a.$ga($i)) * ((double) $b.$gb($i));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column API for [[DotProduct]]. */
  def dotNative(a: Column, b: Column): Column =
    GraftGlue.toColumn(DotProduct(GraftGlue.toExpression(a),
      GraftGlue.toExpression(b)))
}
