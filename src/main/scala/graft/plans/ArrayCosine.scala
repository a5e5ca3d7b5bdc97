package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.graftbridge.{columnToExpr, exprToColumn}

/** Native Catalyst expression: FUSED cosine similarity of two
  * `array<double>` columns — dot product and both squared norms
  * accumulated in ONE traversal, inside whole-stage codegen.
  *
  * The composed form `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`
  * walks each array three times (and re-reads the array header per
  * call); this expression reads each element once. The three
  * accumulators fold in identical element order and the final
  * `s1 / (sqrt(s2) * sqrt(s3))` matches the composed arithmetic
  * exactly, so results are bit-identical to the
  * [[ArrayDotProduct]]-composed form AND to the sequential-fold HOF
  * formulation the DuckDB oracles mirror — swapping it in changes no
  * hashes.
  *
  * Zero-norm inputs yield 0.0 by convention (NOT the composed form's
  * NaN 0/0): a NaN similarity is unordered in the JVM (`NaN > x` is
  * false, so typed argmaxes skip it) but sorts FIRST under DuckDB's
  * `ORDER BY sim DESC`, so any rank-based oracle would diverge on
  * degenerate (zero) vectors. The 0.0 convention is shared by every
  * oracle rendering (`coalesce(dot / NULLIF(norm·norm, 0), 0)`) and
  * by [[graft.functions.VectorOps.cosine]], keeping both engines
  * ordered identically even on zero-norm recomputed centroids. A
  * null array on either side yields null via the binary null
  * contract. Mismatched lengths throw (one int compare per row):
  * truncating to min(length) would silently compute a cosine whose
  * norms disagree with the composed form — ragged embedding columns
  * are a data bug that must surface, not fold away.
  */
case class ArrayCosine(left: Expression, right: Expression)
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

  override def prettyName: String = "array_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) throw new IllegalArgumentException(
      s"array_cosine requires equal-length arrays: $n vs ${y.numElements()}")
    var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      s1 += xi * yi; s2 += xi * xi; s3 += yi * yi
      i += 1
    }
    val denom = math.sqrt(s2) * math.sqrt(s3)
    if (denom == 0.0) 0.0 else s1 / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s1 = ctx.freshName("s1")
      val s2 = ctx.freshName("s2")
      val s3 = ctx.freshName("s3")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "array_cosine requires equal-length arrays: " + $n + " vs " +
         |      $b.numElements());
         |}
         |double $s1 = 0.0; double $s2 = 0.0; double $s3 = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $s1 += $xi * $yi; $s2 += $xi * $xi; $s3 += $yi * $yi;
         |}
         |double ${s1}_d = java.lang.Math.sqrt($s2) * java.lang.Math.sqrt($s3);
         |${ev.value} = ${s1}_d == 0.0 ? 0.0 : $s1 / ${s1}_d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosine =
    copy(left = newLeft, right = newRight)
}

object ArrayCosine {
  /** Column-level entry point: raw (unrounded) fused cosine. */
  def fastCosine(a: Column, b: Column): Column =
    exprToColumn(ArrayCosine(columnToExpr(a), columnToExpr(b)))
}
