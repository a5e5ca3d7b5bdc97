package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.graftbridge.{columnToExpr, exprToColumn}

/** Native Catalyst expression: dot product of two `array<double>`
  * columns with full whole-stage-codegen support.
  *
  * Motivation (SURVEY.md §7.2 preference order — native Expression >
  * composition when hot): the `zip_with`+`aggregate` formulation is a
  * higher-order function, which Catalyst evaluates INTERPRETED
  * (CodegenFallback) — ~130 boxed expression evals per 64-dim row.
  * This expression generates a tight primitive `for` loop inside the
  * surrounding WholeStageCodegen stage instead.
  *
  * Semantics match the sequential fold exactly (same element order,
  * same IEEE double adds), so results — and the DuckDB oracle hashes
  * built on them — are bit-identical to the HOF formulation. Array
  * elements are assumed non-null (embedding vectors); a null ARRAY on
  * either side yields null via the standard binary null contract.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Column-level entry point: `fastDot(a, b)`. */
  def fastDot(a: Column, b: Column): Column =
    exprToColumn(ArrayDotProduct(columnToExpr(a), columnToExpr(b)))
}
