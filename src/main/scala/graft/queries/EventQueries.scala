package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** The reference pipeline's semantics (bronze projection / DQ / clean-silver —
  * reference `spark_jobs/batch_etl.py:42-62`, `dq_checks.py:50-59,103-108`)
  * re-expressed over the driver `events` table as oracle-checkable queries,
  * plus the streaming-shaped windowed aggregation (`window()` tumbling buckets
  * via date_trunc so the same SQL runs in DuckDB) and JSON prop extraction.
  *
  * DQ rules (events-shaped analog of dq_checks.py:50-53):
  *   R1 value < 0 OR value IS NULL      (negative/null fare)
  *   R2 user_id IS NULL                 (missing key)
  *   R3 value > 400                     (outlier, cf. trip_distance > 200)
  *   R4 event_type = 'error'            (domain violation)
  *
  * The four counts run as ONE pass (sum(when)) instead of the reference's
  * four separate count() jobs — same semantics, 4 scans → 1 (SURVEY §2.3 A2).
  */
object EventQueries {

  private val r1 = col("value") < 0 || col("value").isNull
  private val r2 = col("user_id").isNull
  private val r3 = col("value") > 400
  private val r4 = col("event_type") === "error"

  private def cnt(p: org.apache.spark.sql.Column) =
    sum(when(p, 1L).otherwise(0L))

  val all: Seq[Q] = Seq(
    Q(
      "q18_events_bronze",
      (s, d) =>
        events(s, d)
          .select(
            col("event_id"), col("user_id"), col("event_type"), col("value"),
            to_date(col("ts")).as("event_date"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, event_type, value,
             |  CAST(ts AS DATE) AS event_date
             |FROM events
             |ORDER BY event_id""".stripMargin),
      "bronze projection: ns-timestamp ingest + derived partition date (batch_etl.py:46-54)"),

    Q(
      "q19_events_dq_summary",
      (s, d) =>
        events(s, d).agg(
          cnt(r1).as("n_negative_value"),
          cnt(r2).as("n_null_user"),
          cnt(r3).as("n_outlier_value"),
          cnt(r4).as("n_error_type"),
          count(lit(1)).as("n_total")),
      Some("""SELECT
             |  CAST(count(*) FILTER (WHERE value < 0 OR value IS NULL) AS BIGINT) AS n_negative_value,
             |  CAST(count(*) FILTER (WHERE user_id IS NULL) AS BIGINT) AS n_null_user,
             |  CAST(count(*) FILTER (WHERE value > 400) AS BIGINT) AS n_outlier_value,
             |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error_type,
             |  count(*) AS n_total
             |FROM events""".stripMargin),
      "single-pass DQ metrics (dq_checks.py:56-59, 4 jobs → 1 agg)"),

    Q(
      "q20_events_clean",
      (s, d) =>
        events(s, d)
          .filter(!r1 && !r2 && !r3 && !r4)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, event_type, value
             |FROM events
             |WHERE NOT (value < 0 OR value IS NULL) AND user_id IS NOT NULL
             |  AND NOT (value > 400) AND event_type <> 'error'
             |ORDER BY event_id""".stripMargin),
      "clean-silver conjunctive-negation filter (dq_checks.py:103-108)"),

    Q(
      "q21_events_daily_dq",
      (s, d) =>
        events(s, d)
          .groupBy(to_date(col("ts")).as("event_date"))
          .agg(
            count(lit(1)).as("n_total"),
            cnt(r3).as("n_outlier"),
            cnt(r4).as("n_error"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
          .orderBy(col("event_date")),
      Some("""SELECT CAST(ts AS DATE) AS event_date, count(*) AS n_total,
             |  CAST(count(*) FILTER (WHERE value > 400) AS BIGINT) AS n_outlier,
             |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY CAST(ts AS DATE)
             |ORDER BY event_date""".stripMargin),
      "grouped DQ rollup per partition date — the natural generalization of A2"),

    Q(
      "q22_events_hourly",
      (s, d) =>
        events(s, d)
          .groupBy(
            date_trunc("hour", col("ts")).as("bucket"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
          .orderBy(col("bucket"), col("event_type")),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket, event_type,
             |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
             |ORDER BY bucket, event_type""".stripMargin),
      "tumbling event-time buckets — batch twin of the streaming windowed agg (ST3)"),

    Q(
      "q66_dq_structural",
      (s, d) => {
        import graft.pipeline.DqChecks
        val dupEvents = DqChecks.uniquenessViolations(events(s, d), "event_id")
        val orphanOrders = DqChecks.orphanCount(
          graft.Tables.orders(s, d), graft.Tables.customer(s, d),
          "o_custkey", "c_custkey", "n_orphan_orders")
        val orphanLines = DqChecks.orphanCount(
          graft.Tables.lineitem(s, d), graft.Tables.orders(s, d),
          "l_orderkey", "o_orderkey", "n_orphan_lineitems")
        dupEvents.crossJoin(orphanOrders).crossJoin(orphanLines)
      },
      Some("""SELECT
             |  CAST((SELECT count(event_id) - count(DISTINCT event_id) FROM events) AS BIGINT) AS n_dup_event_id,
             |  CAST((SELECT count(*) FROM orders o
             |        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT) AS n_orphan_orders,
             |  CAST((SELECT count(*) FROM lineitem l
             |        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_orphan_lineitems""".stripMargin),
      "structural DQ: key uniqueness + referential integrity (anti-join orphan counts)"),

    Q(
      "q23_events_props",
      (s, d) =>
        events(s, d)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS prop_k
             |FROM events
             |ORDER BY event_id""".stripMargin),
      "semi-structured extraction from the props JSON string (FIXTURES.md B)"),

    Q(
      "q79_events_variant",
      (s, d) =>
        // Spark 4's VariantType path: parse ONCE into the binary variant
        // encoding via a staging projection, then typed extraction — the
        // modern engine-native answer to schemaless JSON columns (vs
        // per-field string parsing in q23). The two variant_gets share the
        // staged column; CollapseProject keeps the single parse because it
        // never inlines a non-cheap alias referenced more than once
        // (PlanSpec pins exactly one parse_json in the optimized plan —
        // r6 bench showed the inline double-parse costing ~2x).
        // Oracle uses DuckDB's JSON extension on the same path.
        events(s, d)
          .select(col("event_id"), parse_json(col("props")).as("__v"))
          .select(
            col("event_id"),
            variant_get(col("__v"), "$.k", "long").as("prop_k"),
            variant_get(col("__v"), "$.missing", "long").isNull
              .cast("long").as("k_missing"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
             |  CAST(json_extract(props, '$.missing') IS NULL AS BIGINT) AS k_missing
             |FROM events
             |ORDER BY event_id""".stripMargin),
      "VariantType semi-structured handling: parse_json + typed variant_get (Spark 4 native JSON encoding)"),

    Q(
      "q71_gold_daily_summary",
      (s, d) =>
        graft.pipeline.GoldAggregate.dailySummary(
          events(s, d).select(
            to_date(col("ts")).as("event_date"),
            col("event_type"), col("user_id"), col("value")))
          .orderBy(col("event_date"), col("event_type")),
      // Twin of GoldAggregate.dailySummary's exact integer-micro pipeline:
      // double round() near a .5 boundary diverges between engines, so both
      // sides round via half-away-from-zero integer division instead.
      Some("""WITH g AS (
             |  SELECT CAST(ts AS DATE) AS event_date, event_type,
             |    count(*) AS n_events,
             |    count(DISTINCT user_id) AS n_users,
             |    sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS micros
             |  FROM events
             |  GROUP BY 1, 2)
             |SELECT event_date, event_type, n_events, n_users,
             |  (CASE WHEN micros >= 0 THEN (2 * micros + 10000) // 20000
             |        ELSE -((2 * -micros + 10000) // 20000) END) / 100.0 AS total_value,
             |  (CASE WHEN micros >= 0 THEN (2 * micros + 100 * n_events) // (200 * n_events)
             |        ELSE -((2 * -micros + 100 * n_events) // (200 * n_events)) END) / 10000.0 AS avg_value
             |FROM g
             |ORDER BY event_date, event_type""".stripMargin),
      "gold layer: daily per-type consumption aggregates (medallion layer from reference README.md:81)"),

    Q(
      "q108_events_profile",
      (s, d) =>
        graft.pipeline.Profiler.profile(
          events(s, d), Seq("event_id", "user_id", "event_type"))
          .orderBy(col("col_name")),
      // min/max stringification is oracle-portable for BIGINT and VARCHAR
      // columns; doubles/timestamps are profiled Spark-side only (their
      // string renderings are engine-specific) — the operator takes any
      // column, the twin pins the portable ones.
      Some("""SELECT * FROM (
             |  SELECT 'event_id' AS col_name, count(*) AS n_rows,
             |    count(*) - count(event_id) AS n_null,
             |    count(DISTINCT event_id) AS n_distinct,
             |    CAST(min(event_id) AS VARCHAR) AS min_val,
             |    CAST(max(event_id) AS VARCHAR) AS max_val
             |  FROM events
             |  UNION ALL
             |  SELECT 'event_type', count(*), count(*) - count(event_type),
             |    count(DISTINCT event_type), min(event_type), max(event_type)
             |  FROM events
             |  UNION ALL
             |  SELECT 'user_id', count(*), count(*) - count(user_id),
             |    count(DISTINCT user_id),
             |    CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
             |  FROM events)
             |ORDER BY col_name""".stripMargin),
      "one-pass column profiler (Profiler.profile): rows/nulls/exact-distinct/min/max per column in a single Expand scan; approx_count_distinct is the 100 TB swap"),

    Q(
      "q111_user_status_history",
      (s, d) => {
        // SCD Type-2 history build (the dimension-table side of CDC,
        // complementing q67's latest-record materialization): collapse
        // each user's event-type stream into change rows, then stamp
        // half-open validity intervals [valid_from, valid_to) with
        // lead(); the open current row has valid_to NULL. Timestamps are
        // emitted as epoch micros (BIGINT) per the parity rules; the
        // (t_us, event_id) compound order makes same-microsecond events
        // deterministic in both engines.
        // SCALE: two window passes over the SAME (user_id, t_us,
        // event_id) sort — Catalyst reuses one exchange+sort for both
        // (the filter between them is sort-preserving), so this is one
        // user_id shuffle end-to-end. user_id is the natural high-
        // cardinality partition key at 100 TB.
        val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("event_id"))
        events(s, d)
          .select(col("user_id"), col("event_id"),
            col("event_type").as("status"),
            unix_micros(col("ts").cast("timestamp")).as("t_us"))
          .withColumn("prev", lag(col("status"), 1).over(w))
          .where(col("prev").isNull || col("prev") =!= col("status"))
          .select(col("user_id"), col("status"),
            col("t_us").as("valid_from_us"),
            lead(col("t_us"), 1).over(w).as("valid_to_us"),
            row_number().over(w).cast("long").as("version"))
          .withColumn("is_current", col("valid_to_us").isNull.cast("long"))
          .orderBy(col("user_id"), col("version"))
      },
      Some("""WITH x AS (
             |  SELECT user_id, event_id, event_type AS status,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, event_id, status, t_us,
             |    lag(status) OVER (PARTITION BY user_id
             |      ORDER BY t_us, event_id) AS prev
             |  FROM x),
             |changes AS (
             |  SELECT user_id, event_id, status, t_us FROM flagged
             |  WHERE prev IS NULL OR prev <> status)
             |SELECT user_id, status,
             |  t_us AS valid_from_us,
             |  lead(t_us) OVER w AS valid_to_us,
             |  row_number() OVER w AS version,
             |  CAST(lead(t_us) OVER w IS NULL AS BIGINT) AS is_current
             |FROM changes
             |WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
             |ORDER BY user_id, version""".stripMargin),
      "SCD Type-2 history build: per-user status change rows with half-open validity intervals (lead) and current-row flag"),

    Q(
      "q116_trailing_features",
      (s, d) => {
        // Trailing time-window features — the ML feature-engineering
        // staple (how many events / how much value did this user generate
        // in the hour before each event): a value-RANGE frame over epoch
        // micros, partitioned by user_id. This is the RANGE-frame shape
        // that IS scale-right as written — it partitions by the
        // high-cardinality user key, so parallelism grows with users.
        // (q78's ±band over a 3-value enum can't be written this way; it
        // routes through OrderStats' bucketed prefix sums instead, with
        // q89 as its histogram monitoring twin.)
        // RANGE (not ROWS) so same-microsecond peers get identical
        // frames in both engines; money in exact cents.
        val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"))
          .rangeBetween(-3600000000L, 0L)
        events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("t_us"),
            expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("cents"))
          .select(col("user_id"), col("event_id"), col("t_us"),
            count(lit(1)).over(w).as("n_1h"),
            sum(col("cents")).over(w).as("cents_1h"))
          .orderBy(col("user_id"), col("t_us"), col("event_id"))
      },
      Some("""WITH x AS (
             |  SELECT user_id, event_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events)
             |SELECT user_id, event_id, t_us,
             |  count(*) OVER w AS n_1h,
             |  CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
             |FROM x
             |WINDOW w AS (PARTITION BY user_id ORDER BY t_us
             |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, t_us, event_id""".stripMargin),
      "trailing time-window features: per-user 1-hour RANGE frame over epoch micros (count + exact-cents sum) — the scale-right RANGE shape (high-cardinality partition key)"),

    Q(
      "q117_value_anomaly",
      (s, d) => {
        // Quantile-threshold anomaly screen: learn a per-type p99 cutoff
        // from the distribution, then re-scan to count exceedances — the
        // canonical two-pass "fit a threshold, broadcast it back" shape
        // (monitoring/alerting; also outlier-filtering training data).
        // Exact-cents integers end to end; percentile_disc picks an ACTUAL
        // data value (Spark ≡ DuckDB quantile_disc, the q46-proven pair) so
        // no interpolation arithmetic exists to diverge. SCALE: pass 1 is a
        // per-enum-key sort aggregate — the oracle-exact baseline; at
        // 100 TB swap percentile_disc for approx_percentile (q68 pairing)
        // and the threshold frame (≤|event_type| rows) still broadcasts.
        val ev = events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"),
            expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("cents"))
        val thr = ev.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          expr("CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY cents) AS BIGINT)")
            .as("p99_cents"),
          max(col("cents")).as("max_cents"))
        ev.join(broadcast(thr), Seq("event_type"))
          .groupBy(col("event_type"), col("n"), col("p99_cents"), col("max_cents"))
          .agg(count(when(col("cents") > col("p99_cents"), 1)).as("n_above"))
          .orderBy(col("event_type"))
      },
      Some("""WITH cents AS (
             |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events WHERE value IS NOT NULL),
             |thr AS (
             |  SELECT event_type, count(*) AS n,
             |    CAST(quantile_disc(cents, 0.99) AS BIGINT) AS p99_cents,
             |    max(cents) AS max_cents
             |  FROM cents GROUP BY event_type)
             |SELECT t.event_type, t.n, t.p99_cents, t.max_cents,
             |  CAST(count(CASE WHEN c.cents > t.p99_cents THEN 1 END) AS BIGINT) AS n_above
             |FROM cents c JOIN thr t USING (event_type)
             |GROUP BY t.event_type, t.n, t.p99_cents, t.max_cents
             |ORDER BY t.event_type""".stripMargin),
      "quantile-threshold anomaly screen: per-type exact p99 (integer cents) broadcast back to count exceedances — two-pass fit-then-apply; 100 TB swap is approx_percentile (q68 pairing)"),

    Q(
      "q118_rolling_active_users",
      (s, d) => {
        // Retention / engagement rollup: daily active users beside the
        // trailing-7-day distinct count. Rolling DISTINCT can't ride a
        // window frame (no distinct-over-RANGE), so each (day, user) pair
        // is fanned out to the ≤7 report days it supports (bounded ×7
        // Generate), then de-duplicated — both distincts shuffle on the
        // high-cardinality (day, user) key, so parallelism grows with
        // users and days; only the final per-day counts are small.
        // The report is driven from the WAU side (left join, dau
        // coalesced to 0) so a calendar day with trailing-7-day activity
        // but zero same-day events still appears, capped at the last
        // OBSERVED day so the ×7 fan-out can't invent future report days
        // (r5 advisor: the old inner join silently dropped gap days).
        val du = events(s, d)
          .filter(col("user_id").isNotNull)
          .select(to_date(col("ts")).as("day"), col("user_id"))
          .distinct()
        val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
        val maxDay = du.agg(max(col("day")).as("max_day"))
        val wau = du
          .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("day"),
            col("user_id"))
          .distinct()
          .groupBy(col("day")).agg(count(lit(1)).as("wau"))
        wau.join(broadcast(maxDay), col("day") <= col("max_day"))
          .join(dau, Seq("day"), "left")
          .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("wau"))
          .orderBy(col("day"))
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
             |  FROM events WHERE user_id IS NOT NULL),
             |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day),
             |wau AS (
             |  SELECT day, CAST(count(*) AS BIGINT) AS wau FROM (
             |    SELECT DISTINCT du.day + x.i AS day, du.user_id
             |    FROM du CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6]) AS i) x)
             |  GROUP BY day)
             |SELECT w.day, COALESCE(d.dau, 0) AS dau, w.wau
             |FROM wau w LEFT JOIN dau d USING (day)
             |WHERE w.day <= (SELECT max(day) FROM du)
             |ORDER BY day""".stripMargin),
      "retention rollup: DAU + trailing-7-day distinct users per day — rolling distinct via bounded ×7 fan-out + re-distinct on the high-cardinality (day, user) key; WAU-driven left join (dau=0 gap days) capped at the last observed day"),

    Q(
      "q119_cohort_retention",
      (s, d) => {
        // Weekly cohort retention matrix: users grouped by first-seen day,
        // counted in each subsequent activity week — the classic
        // product-analytics triangle. Every stage keys on user_id or on
        // (cohort_day, week_idx) — a grid whose size is days×weeks, not
        // data volume — so the heavy shuffles (distinct, first-seen agg,
        // cohort join-back) all ride the high-cardinality user key; week
        // index is exact integer floor-division of a day delta (DIV both
        // engines, non-negative by construction).
        val ue = events(s, d)
          .filter(col("user_id").isNotNull)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val cohort = ue.groupBy(col("user_id")).agg(min(col("day")).as("c0"))
        ue.join(cohort, Seq("user_id"))
          .select(col("c0").as("cohort_day"), col("user_id"),
            expr("CAST(datediff(day, c0) DIV 7 AS BIGINT)").as("week_idx"))
          .distinct()
          .groupBy(col("cohort_day"), col("week_idx"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("cohort_day"), col("week_idx"))
      },
      Some("""WITH ue AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
             |  FROM events WHERE user_id IS NOT NULL),
             |c AS (SELECT user_id, min(day) AS c0 FROM ue GROUP BY user_id)
             |SELECT c.c0 AS cohort_day,
             |  CAST((ue.day - c.c0) // 7 AS BIGINT) AS week_idx,
             |  CAST(count(DISTINCT ue.user_id) AS BIGINT) AS n_users
             |FROM ue JOIN c USING (user_id)
             |GROUP BY c.c0, CAST((ue.day - c.c0) // 7 AS BIGINT)
             |ORDER BY cohort_day, week_idx""".stripMargin),
      "weekly cohort retention matrix: first-seen-day cohorts × activity-week index (exact integer day-delta DIV 7); all shuffles on the high-cardinality user key"),

    Q(
      "q120_value_anomaly_approx",
      (s, d) => {
        // q117's 100 TB scale path, registered as a runnable query (r5
        // verdict #5): identical fit-then-apply shape, but pass 1 fits the
        // per-type p99 with approx_percentile — a map-side-combining
        // sketch aggregate whose per-partition state is a bounded buffer,
        // so the fact column no longer funnels through ≤|taxonomy| exact
        // sort tasks; parallelism is the input partition count at any
        // scale. Pass 2 is unchanged: the ≤|taxonomy|-row threshold frame
        // broadcasts back against the stream. Rows-only (DuckDB's
        // approx sketch differs); agreement with q117's exact answer is
        // pinned by a ScalaTest tolerance check (the q68 pattern).
        val ev = events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"),
            expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("cents"))
        val thr = ev.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          expr("approx_percentile(cents, 0.99, 10000)").as("p99_cents"),
          max(col("cents")).as("max_cents"))
        ev.join(broadcast(thr), Seq("event_type"))
          .groupBy(col("event_type"), col("n"), col("p99_cents"), col("max_cents"))
          .agg(count(when(col("cents") > col("p99_cents"), 1)).as("n_above"))
          .orderBy(col("event_type"))
      },
      None,
      "q117's sketch scale path: per-type approx_percentile(0.99) threshold (fully-parallel sketch agg, no enum-key sort funnel) broadcast back to count exceedances; tolerance vs q117 pinned in ScalaTest"))
}
