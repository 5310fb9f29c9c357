package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.Drift

/** Distribution-drift monitors over the events stream (see
  * `operators/Drift.scala`): the ingest-guard layer ABOVE row DQ — the
  * reference pipeline's checks (dq_checks.py) validate rows; these
  * validate the SHAPE of a batch against a reference window, catching
  * upstream changes that arrive as individually-valid rows.
  *
  * Oracle float discipline: all scores are integer micros through one
  * shared IEEE expression string evaluated by BOTH engines (the
  * q131/q135 pattern); every count feeding them is exact int64.
  */
object DriftQueries {

  /** q141's per-bucket PSI contribution (p−q)·ln(p/q) in integer
    * micros. Expects Laplace-smoothed share fractions as exact-integer
    * columns pn/pd (reference) and qn/qd (current) in scope.
    */
  private[queries] val psiMicros: String = graft.operators.Drift.psiMicrosExpr

  /** q142's KS statistic D = ks_num/(n_a·n_b) in integer micros; the
    * numerator max is exact int64, only this one division is float.
    */
  private[queries] val ksMicros: String = graft.operators.Drift.ksMicrosExpr

  val all: Seq[Q] = Seq(
    Q(
      "q141_drift_psi",
      (s, d) => {
        // PSI of the `value` distribution between a deterministic
        // reference window (even days-of-month) and the current window
        // (odd days) — 20 equal-width buckets over [0, 500), Laplace
        // smoothing so empty buckets contribute finitely. Per-bucket
        // contributions (not just the sum): the actionable output, since
        // WHICH buckets moved is what a pipeline owner reads. SCALE: one
        // map-side-combined aggregate to 20 rows per side; everything
        // after is constant-size. The standard alert thresholds on
        // sum(psi) are 0.1/0.25 (industry convention) — policy, not
        // computed here.
        val e = events(s, d).filter(col("value").isNotNull)
        val ref = e.filter(dayofmonth(col("ts")) % 2 === 0)
        val cur = e.filter(dayofmonth(col("ts")) % 2 === 1)
        Drift.bucketCounts(ref, cur, "value", 0.0, 500.0, 20)
          .select(col("bucket"), col("ref_n"), col("cur_n"),
            expr(psiMicros).as("psi_contrib_micros"))
          .orderBy(col("bucket"))
      },
      Some(s"""WITH e AS (
             |  SELECT value,
             |    day(CAST(ts AS TIMESTAMP)) % 2 = 0 AS is_ref
             |  FROM events WHERE value IS NOT NULL),
             |b AS (
             |  SELECT CAST(least(greatest(floor((value - 0.0) / 25.0), 0), 19) AS BIGINT) AS bucket,
             |    is_ref
             |  FROM e),
             |c AS (
             |  SELECT bucket,
             |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
             |    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cur_n
             |  FROM b GROUP BY bucket),
             |dom AS (SELECT range AS bucket FROM range(20)),
             |j AS (
             |  SELECT dom.bucket,
             |    COALESCE(ref_n, 0) AS ref_n, COALESCE(cur_n, 0) AS cur_n
             |  FROM dom LEFT JOIN c ON c.bucket = dom.bucket),
             |t AS (
             |  SELECT CAST(sum(ref_n) + 20 AS BIGINT) AS pd,
             |    CAST(sum(cur_n) + 20 AS BIGINT) AS qd FROM j),
             |f AS (
             |  SELECT bucket, ref_n, cur_n,
             |    ref_n + 1 AS pn, pd, cur_n + 1 AS qn, qd
             |  FROM j CROSS JOIN t)
             |SELECT bucket, ref_n, cur_n, $psiMicros AS psi_contrib_micros
             |FROM f
             |ORDER BY bucket""".stripMargin),
      "PSI drift monitor: value distribution, even- vs odd-day windows, 20 Laplace-smoothed buckets over [0,500) — per-bucket (p-q)ln(p/q) contributions in integer micros; constant-size state after one map-combined agg (the batch-ingest distribution guard)"),

    Q(
      "q142_drift_ks",
      (s, d) => {
        // Exact two-sample Kolmogorov–Smirnov between purchase and view
        // `value` distributions on the floor(value) grid. The KS
        // numerator max|cumA·n_b − cumB·n_a| is pure int64 — no float
        // CDF subtraction ever decides the max — and the one division
        // happens once, canonicalized to micros. SCALE: the cumulative
        // window is global-ordered but runs AFTER aggregation to the
        // ~500-value grid, so the sorted frame is grid-sized at any
        // input size (quantize-then-exact-KS is the scale shape; the
        // grid is the precision dial).
        val e = events(s, d)
          .filter(col("event_type").isin("purchase", "view"))
        Drift.ksCounts(e, "value", col("event_type") === "purchase")
          .select(col("ks_num"), col("n_a"), col("n_b"),
            expr(ksMicros).as("ks_micros"))
      },
      Some(s"""WITH v AS (
             |  SELECT CAST(floor(value) AS BIGINT) AS g,
             |    event_type = 'purchase' AS a
             |  FROM events
             |  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
             |c AS (
             |  SELECT g,
             |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
             |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS nb
             |  FROM v GROUP BY g),
             |s AS (
             |  SELECT
             |    CAST(sum(na) OVER (ORDER BY g
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cna,
             |    CAST(sum(nb) OVER (ORDER BY g
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cnb
             |  FROM c),
             |t AS (
             |  SELECT CAST(sum(na) AS BIGINT) AS n_a,
             |    CAST(sum(nb) AS BIGINT) AS n_b FROM c)
             |SELECT max(abs(cna * n_b - cnb * n_a)) AS ks_num, n_a, n_b,
             |  $ksMicros AS ks_micros
             |FROM s CROSS JOIN t
             |GROUP BY n_a, n_b""".stripMargin),
      "exact two-sample KS drift test (purchase vs view value distributions) on the floor-grid: int64-exact numerator max|cumA*nb - cumB*na|, one canonicalized division — grid-bounded sort, the quantize-then-exact scale shape"))
}
