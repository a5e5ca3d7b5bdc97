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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def binary(name: String, cls: Class[_],
      build: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"$name expects 2 arguments, got ${children.length}")
      build(children.head, children(1))
    })

  private val functions = Seq(
    binary("array_dot_product", classOf[ArrayDotProduct], ArrayDotProduct.apply),
    binary("array_cosine", classOf[ArrayCosine], ArrayCosine.apply))

  /** Programmatic registration into an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { f =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        f._1.funcName, f._3, "built-in")
    }
}
