package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query: a Spark DataFrame builder plus (when SQL-expressible) an
  * ANSI-SQL oracle that DuckDB runs on the same parquet tables.
  *
  * Parity rules (see SURVEY.md §7.4), applied to every query here:
  *  - deterministic ORDER BY on a unique key in BOTH versions;
  *  - every aggregate / computed column aliased to the same name in both;
  *  - float aggregates rounded in both (sum order differs between engines);
  *  - integer widths matched (DuckDB count/len/row_number are BIGINT →
  *    Spark side is cast to long; DuckDB sum(int) is HUGEINT → avoided/cast).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  val all: Seq[Q] =
    StarQueries.all ++ EventQueries.all ++ DocQueries.all ++ VectorQueries.all ++
      LlmQueries.all ++ ExtraQueries.all ++ CurationQueries.all ++
      ClusterQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
