package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator inventory (SURVEY §2): each entry
  * is a pure `(SparkSession, sfDir) => DataFrame` built from `graft.queries.*`
  * and `graft.operators.*`; `oracleSql` carries the DuckDB twin where the
  * operation is ANSI-SQL-expressible (streaming/write/pipeline operators are
  * covered by ScalaTest instead, per the contract).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the full reference pipeline shape in one plan: ns-timestamp
    * ingest → DQ filter → derived date → grouped agg → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q21_events_daily_dq").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
