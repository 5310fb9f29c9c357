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
    * and never frees it. Strips row-preserving wrappers (a projection or
    * filter over the checkpoint — e.g. an internal bookkeeping column
    * dropped before return) but deliberately does NOT traverse joins or
    * aggregates: releasing a frame must only ever free a checkpoint the
    * frame IS, never one it merely references — locally-checkpointed RDDs
    * have truncated lineage, so freeing a shared one breaks every other
    * frame built on it. No-op when the effective root is not a checkpoint.
    */
  def releaseCheckpoint(df: Dataset[_]): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
    @annotation.tailrec
    def go(p: LogicalPlan): Unit = p match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case x: Project => go(x.child)
      case x: Filter => go(x.child)
      case x: SubqueryAlias => go(x.child)
      case _ => ()
    }
    go(df.queryExecution.logical)
  }
}
