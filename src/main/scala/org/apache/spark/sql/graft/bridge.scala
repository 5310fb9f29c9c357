package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

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

  /** Unpersist the block-manager storage behind an eagerly
    * `localCheckpoint`ed Dataset. The checkpointed data lives in the RDD
    * wrapped by the Dataset's `LogicalRDD` plan node (`private[sql]`,
    * hence this shim); `Dataset.unpersist` only talks to the CacheManager
    * and never frees it. Traverses the whole plan so a projection over a
    * checkpoint (e.g. an internal bookkeeping column dropped before
    * return) still releases the underlying RDD. No-op when the plan holds
    * no checkpoint.
    */
  def releaseCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.logical.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
