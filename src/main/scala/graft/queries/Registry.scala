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
  *
  * DuckDB-VERSION-SENSITIVE idioms (observed round 4: q78/q82 passed local
  * DuckDB 1.0.0 tri-scale bit-exact yet failed the driver's newer build;
  * round-5 probes q90–q97 adjudicated the candidates — the single red row,
  * q96, convicted UNCAST `list_aggregate(l,'sum')` result typing; the
  * probes are deleted now that the verdict is in). Avoid in new twins;
  * use the stable form:
  *  - `CAST(<double> AS DECIMAL(p,s))` — double→decimal rounding is an
  *    engine/version implementation detail. Stable: the binary-fixed-point
  *    idiom `CAST(floor(x * scale + 0.5) AS BIGINT)` with a power-of-ten
  *    (cents) or power-of-two (q85) scale — pure IEEE ops, identical trees.
  *  - DECIMAL literals in division (`127.0 / x`) — decimal-vs-double
  *    operator routing may change across versions. Stable:
  *    `CAST(127 AS DOUBLE) / x` (Spark: `lit(127.0d)`), and stage the
  *    denominator once in a MATERIALIZED CTE column.
  *  - raw computed DOUBLE output columns — emit the integer canonical form
  *    (cents/micros/fixed-point) instead wherever the column exists to be
  *    compared. Parquet-read doubles passed through UNTOUCHED are fine.
  *  - `list_aggregate(l, 'sum')` result typing — wrap in CAST(... AS
  *    BIGINT) (integral lists) so a HUGEINT/DOUBLE typing change can't
  *    surface; same for any aggregate `sum()` (HUGEINT rule above).
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
      ClusterQueries.all ++ AssemblyQueries.all ++ PqQueries.all ++
      DriftQueries.all ++ RetrievalQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
