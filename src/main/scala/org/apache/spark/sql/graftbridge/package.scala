package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Expression↔Column converters of
  * Spark 4's classic API — the sanctioned pattern for libraries that
  * register custom Catalyst expressions without a SQL-function
  * registry entry. */
package object graftbridge {
  def exprToColumn(e: Expression): Column = ExpressionUtils.column(e)
  def columnToExpr(c: Column): Expression = ExpressionUtils.expression(c)
}
