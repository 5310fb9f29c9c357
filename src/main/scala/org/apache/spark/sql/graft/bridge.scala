package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst Expressions.
  *
  * Spark 4 made Column wrap a connect-compatible ColumnNode; the classic
  * Expression⇄Column converters live behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so custom native
  * expressions need this one-file package-scoped shim — the standard
  * technique used by public Spark extension libraries.
  */
object bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
