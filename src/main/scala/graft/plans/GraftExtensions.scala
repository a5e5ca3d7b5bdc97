package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point — registers the custom Catalyst expressions
  * as SQL functions. Two deployment styles:
  *
  *  - cluster config:
  *    `spark.sql.extensions=graft.plans.GraftExtensions`
  *  - programmatic, on an existing session:
  *    `GraftExtensions.register(spark)`
  *
  * After either, `SELECT array_dot_product(a, b)` works in Spark SQL
  * with full codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.arrayDotProduct)
  }
}

object GraftExtensions {
  private val arrayDotProduct: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot_product"),
    new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot_product"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"array_dot_product expects 2 arguments, got ${children.length}")
      ArrayDotProduct(children.head, children(1))
    })

  /** Programmatic registration into an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      arrayDotProduct._1.funcName, arrayDotProduct._3, "built-in")
}
