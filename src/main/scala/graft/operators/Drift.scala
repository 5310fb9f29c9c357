package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between a reference and a current
  * sample of one numeric column — the ingest-guard family a standing
  * 100 TB corpus needs on top of row-level DQ: row checks catch bad
  * VALUES, drift checks catch bad DISTRIBUTIONS (a upstream schema
  * change, a source gone silent, a unit change) that arrive as
  * individually-valid rows.
  *
  * Two complementary shapes:
  *  - [[bucketCounts]]: fixed equal-width buckets → Laplace-smoothed
  *    contingency counts, the substrate for PSI (Population Stability
  *    Index, q141) and any f-divergence. Bounded state (nBuckets rows
  *    after one map-side-combined aggregate) at ANY input size — the
  *    monitoring shape that runs per batch at 100 TB.
  *  - [[ksCounts]]: exact two-sample Kolmogorov–Smirnov on a QUANTIZED
  *    grid (q142): cumulative counts over the distinct grid values. The
  *    cumulative window is global-ordered but runs on the post-aggregate
  *    grid frame (|grid| rows, not |input|), so the sort is bounded by
  *    the grid, not the data. The KS numerator max|cna·tb − cnb·ta| is
  *    EXACT int64 arithmetic — no float CDF subtraction deciding the
  *    max between two near-equal candidates (cumulative counts stay
  *    below ~3e9 per side for int64 products, the q73 bound family).
  */
object Drift {

  /** Per-bucket PSI contribution (p−q)·ln(p/q) in integer micros, over
    * the Laplace-smoothed exact-integer share fractions pn/pd (reference)
    * and qn/qd (current) that [[bucketCounts]] emits. ONE expression
    * string shared by q141's Spark side, its DuckDB oracle twin, and the
    * streaming monitor ([[graft.streaming.DriftStream]]) — identical IEEE
    * trees by construction (the q131/q135 canonicalization pattern).
    */
  val psiMicrosExpr: String =
    "CAST(floor((CAST(pn AS DOUBLE) / CAST(pd AS DOUBLE)" +
      " - CAST(qn AS DOUBLE) / CAST(qd AS DOUBLE))" +
      " * ln((CAST(pn AS DOUBLE) / CAST(pd AS DOUBLE))" +
      " / (CAST(qn AS DOUBLE) / CAST(qd AS DOUBLE)))" +
      " * 1000000 + 0.5) AS BIGINT)"

  /** q142's KS statistic D = ks_num/(n_a·n_b) in integer micros over
    * [[ksCounts]]'s one-row output; the numerator max is exact int64,
    * only this one division is float — ONE expression string shared by
    * the batch query, its DuckDB oracle twin, and the streaming monitor.
    */
  val ksMicrosExpr: String =
    "CAST(floor(CAST(ks_num AS DOUBLE)" +
      " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))" +
      " * 1000000 + 0.5) AS BIGINT)"

  /** Per-bucket contingency counts over the FULL bucket domain
    * [0, nBuckets): (bucket, ref_n, cur_n, pn, pd, qn, qd) with
    * pn/pd (qn/qd) the Laplace-smoothed share numerator/denominator of
    * the reference (current) side — exact integers; score expressions
    * (e.g. q141's PSI micros tree) are applied by the caller so oracle
    * float canonicalization stays in one place.
    */
  def bucketCounts(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, s"bad bucket spec [$lo,$hi)/$nBuckets")
    val width = (hi - lo) / nBuckets
    def counts(df: DataFrame, as: String) =
      df.filter(col(valueCol).isNotNull)
        .select(least(greatest(
            floor((col(valueCol) - lit(lo)) / lit(width)), lit(0L)),
          lit(nBuckets - 1L)).cast("long").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(as))
    val domain = ref.sparkSession.range(nBuckets).toDF("bucket")
    val joined = domain
      .join(counts(ref, "ref_n"), Seq("bucket"), "left")
      .join(counts(cur, "cur_n"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val totals = joined.agg(
      (sum(col("ref_n")) + nBuckets).as("pd"),
      (sum(col("cur_n")) + nBuckets).as("qd"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("ref_n"), col("cur_n"),
        (col("ref_n") + 1L).as("pn"), col("pd"),
        (col("cur_n") + 1L).as("qn"), col("qd"))
  }

  /** Exact two-sample KS counts on the `floor(value)` grid between rows
    * matching `isA` and the rest: one row — (ks_num, n_a, n_b) with
    * ks_num = max over grid of |cumA·n_b − cumB·n_a|. The statistic is
    * D = ks_num / (n_a·n_b); callers canonicalize the division.
    */
  def ksCounts(df: DataFrame, valueCol: String,
      isA: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the grid key is DECLARED as a width-1 integral bucket (`x DIV 1`
    // aliased `bucket`) — same values as floor(), but the plan now
    // carries the structural claim ScaleGuardSpec verifies: the global
    // cumulative window below sorts a histogram whose cardinality is
    // the VALUE DOMAIN (data-model-bounded), never the row count
    // rows whose side predicate is NULL are EXCLUDED, not defaulted: the
    // when/otherwise counters below would silently fold a NULL tag into
    // side B (when(a,1).otherwise(0) and when(a,0).otherwise(1) both take
    // the otherwise branch), inflating B's distribution instead of
    // erroring — q142 pre-filters its predicate non-NULL, this guard
    // makes the operator itself safe for callers that don't
    val grid = df.filter(col(valueCol).isNotNull && isA.isNotNull)
      .select(expr(s"CAST(floor($valueCol) AS BIGINT) DIV 1").as("bucket"),
        isA.as("a"))
      .groupBy(col("bucket")).agg(
        sum(when(col("a"), 1L).otherwise(0L)).as("na"),
        sum(when(col("a"), 0L).otherwise(1L)).as("nb"))
    // global-ordered cumulative over the GRID (bounded rows), not the data
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .select(sum(col("na")).over(w).as("cna"), sum(col("nb")).over(w).as("cnb"))
      .crossJoin(broadcast(
        grid.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))))
      .agg(
        max(abs(col("cna") * col("tb") - col("cnb") * col("ta"))).as("ks_num"),
        max(col("ta")).as("n_a"), max(col("tb")).as("n_b"))
  }
}
