package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (time-travel) join: for each left row, the most recent right row
  * with the same key and timestamp at-or-before the left timestamp.
  *
  * Implemented as union + window rather than a join (tier (a) of the
  * custom-op ladder — composition expresses the semantics exactly, so no
  * custom LogicalPlan/Strategy is warranted): tag both sides, sort within
  * each key by (ts, right-before-left on ties), and carry the latest right
  * timestamp forward with last(ignoreNulls). ONE shuffle on the key, no
  * join node, no range-explosion — the classic scalable as-of shape.
  */
object AsOf {

  /** Attach `out` = latest right `ts` at-or-before each left row's `ts`
    * within `key` (NULL when no prior right row exists). `right` needs only
    * (key, ts); extra left columns pass through.
    */
  def lastRightAtOrBefore(left: DataFrame, right: DataFrame,
      key: String, ts: String, out: String): DataFrame = {
    val tsType = left.schema(ts).dataType
    val l = left
      .withColumn("__side", lit(0))
      .withColumn("__rts", lit(null).cast(tsType))
    val r = right.select(col(key), col(ts))
      .withColumn("__side", lit(1))
      .withColumn("__rts", col(ts))
    val u = l.unionByName(r, allowMissingColumns = true)
    // ties: the right row sorts first so "at-or-before" includes equal ts
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(out, last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__side", "__rts")
  }
}
