package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler — the schema-drift / data-audit counterpart to
  * the rule-based DQ in [[DqChecks]] (reference dq_checks.py runs only
  * fixed predicates; profiling is the step that tells you which predicates
  * to write): per column, row count, null count, exact distinct count, and
  * min/max rendered as strings so heterogeneous column types stack into
  * one report.
  *
  * All statistics compute in ONE aggregate job over one scan: Spark plans
  * the multiple DISTINCT aggregates with a single Expand (factor =
  * #profiled columns + 1), so the input is read once regardless of how
  * many columns are profiled. Exact distinct is the oracle baseline; at
  * 100 TB swap `countDistinct` for `approx_count_distinct` (the q55 HLL
  * pairing) — the expand factor and the per-column exact hash state both
  * drop away, leaving a plain single-pass agg.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +: cols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
          countDistinct(col(c)).as(s"__dist_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols
      .map(c => s"'$c', __n, __null_$c, __dist_$c, __min_$c, __max_$c")
      .mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stacked) AS (col_name, n_rows, n_null, n_distinct, min_val, max_val)"))
  }
}
