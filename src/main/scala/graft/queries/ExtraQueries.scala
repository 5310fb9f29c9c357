package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Second relational batch: the built-in capability families the first
  * batch didn't reach — UNION, HAVING, CASE WHEN, statistical aggregates,
  * exact percentiles, batch sessionization (windowed gap detection — the
  * batch twin of streaming session_window), analytic windows
  * (ntile/percent_rank/cume_dist/first/last), CUBE, scalar subqueries, and
  * the IN/BETWEEN/LIKE predicate family.
  */
object ExtraQueries {

  val all: Seq[Q] = Seq(
    Q(
      "q42_union_custkeys",
      (s, d) => {
        val o = orders(s, d)
        o.filter(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("custkey"))
          .union(o.filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey").as("custkey")))
          .distinct()
          .orderBy(col("custkey"))
      },
      Some("""SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
             |UNION
             |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY custkey""".stripMargin),
      "set op: UNION (distinct) of two filtered key sets"),

    Q(
      "q43_big_customers",
      (s, d) =>
        orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
          .filter(col("n_orders") >= 15)
          .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey, count(*) AS n_orders,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders
             |GROUP BY o_custkey
             |HAVING count(*) >= 15
             |ORDER BY o_custkey""".stripMargin),
      "grouped agg + HAVING-style post-aggregation filter"),

    Q(
      "q44_price_buckets",
      (s, d) =>
        orders(s, d)
          .withColumn("bucket",
            when(col("o_totalprice") < 100000, "small")
              .when(col("o_totalprice") < 300000, "medium")
              .otherwise("large"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            (sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") / count(lit(1)))
              .as("avg_price"))
          .orderBy(col("bucket")),
      Some("""SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
             |            WHEN o_totalprice < 300000 THEN 'medium'
             |            ELSE 'large' END AS bucket,
             |  count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
             |FROM orders
             |GROUP BY 1
             |ORDER BY bucket""".stripMargin),
      "CASE WHEN bucketing as a grouping key"),

    Q(
      "q45_stats_by_flag",
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
            round(var_samp(col("l_quantity")), 2).as("var_qty"),
            round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_pq"),
            round(covar_samp(col("l_extendedprice"), col("l_discount")), 2).as("cov_pd"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
             |  round(var_samp(l_quantity), 2) AS var_qty,
             |  round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
             |  round(covar_samp(l_extendedprice, l_discount), 2) AS cov_pd
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin),
      "statistical aggregate family: stddev/variance/corr/covar"),

    Q(
      "q46_price_percentiles",
      (s, d) => {
        // Discrete percentiles pick an ACTUAL data value, so no
        // interpolation arithmetic exists to diverge by 1 ulp between
        // engines and flip a rounded digit (interpolated quantile_cont vs
        // percentile did exactly that at sf0.001).
        // SCALE (round 6): EXACT and fully parallel. Earlier rounds ran a
        // row_number window partitioned by the 3-value l_returnflag — a
        // whole-table sort through 3 tasks at 100 TB, tolerated only as a
        // fenced oracle baseline. Now OrderStats.percentilesDisc reduces
        // facts to the distinct-price table (shuffle keyed on the PRICE),
        // builds the exact cumulative count via bucketed two-level prefix
        // sums (within-bucket windows hold <= W distinct values; the only
        // enum-partition window runs over O(price-range/W) HISTOGRAM
        // rows), and picks the smallest price whose cumulative reaches
        // ceil(q*n) in exact integer arithmetic. Same answer as
        // percentile_disc, no bounded-parallelism sort anywhere. q68's
        // approx_percentile sketch remains the one-pass monitoring
        // variant.
        graft.operators.OrderStats.percentilesDisc(
          lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice")),
          Seq("l_returnflag"), "l_extendedprice",
          // monotone integer order key for bucketing only (the pick
          // returns the exact double); bit-portable floor(x*100+0.5)
          expr("CAST(floor(l_extendedprice * 100.0D + 0.5D) AS BIGINT)"),
          100000L,
          Seq(("__p50", 1L, 2L), ("__p90", 9L, 10L), ("__p99", 99L, 100L)))
          .select(col("l_returnflag"),
            round(col("__p50"), 2).as("p50"),
            round(col("__p90"), 2).as("p90"),
            round(col("__p99"), 2).as("p99"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_disc(l_extendedprice, 0.5), 2) AS p50,
             |  round(quantile_disc(l_extendedprice, 0.9), 2) AS p90,
             |  round(quantile_disc(l_extendedprice, 0.99), 2) AS p99
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin),
      "exact discrete percentiles (Spark percentile_disc ≡ DuckDB quantile_disc; actual data values, no interpolation)"),

    Q(
      "q47_user_sessions",
      (s, d) => {
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("event_id"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("t_us"))
          .withColumn("new_session",
            when(col("t_us") - lag(col("t_us"), 1).over(wOrd) > 1800000000L, 1L)
              .when(lag(col("t_us"), 1).over(wOrd).isNull, 1L)
              .otherwise(0L))
          .withColumn("session_idx", sum(col("new_session")).over(wRun))
          .groupBy(col("user_id"), col("session_idx"))
          .agg(count(lit(1)).as("n_events"),
            ((max(col("t_us")) - min(col("t_us"))) / lit(1000000L)).cast("long").as("duration_s"))
          .orderBy(col("user_id"), col("session_idx"))
      },
      Some("""WITH x AS (
             |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, event_id, t_us,
             |    CASE WHEN t_us - lag(t_us) OVER w > 1800000000 THEN 1
             |         WHEN lag(t_us) OVER w IS NULL THEN 1
             |         ELSE 0 END AS new_session
             |  FROM x
             |  WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
             |sessions AS (
             |  SELECT user_id, t_us,
             |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY t_us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
             |  FROM flagged)
             |SELECT user_id, session_idx, count(*) AS n_events,
             |  CAST((max(t_us) - min(t_us)) // 1000000 AS BIGINT) AS duration_s
             |FROM sessions
             |GROUP BY user_id, session_idx
             |ORDER BY user_id, session_idx""".stripMargin),
      "batch sessionization: 30-min gap detection via lag + running sum (twin of streaming session_window)"),

    Q(
      "q48_distinct_event_types",
      (s, d) =>
        events(s, d).select(col("event_type")).distinct().orderBy(col("event_type")),
      Some("SELECT DISTINCT event_type FROM events ORDER BY event_type"),
      "DISTINCT projection"),

    Q(
      "q49_predicate_family",
      (s, d) =>
        part(s, d)
          .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
            col("p_size").between(10, 40) &&
            col("p_name").like("%gear%"))
          .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, p_name, p_brand, p_size
             |FROM part
             |WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
             |  AND p_size BETWEEN 10 AND 40
             |  AND p_name LIKE '%gear%'
             |ORDER BY p_partkey""".stripMargin),
      "IN-list + BETWEEN + LIKE predicate family (all pushed to the scan)"),

    Q(
      "q50_null_functions",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        orders(s, d)
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .select(
            col("o_orderkey"),
            round(coalesce(col("prev_price"), lit(0.0)), 2).as("prev_or_zero"),
            nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
            round(greatest(col("o_totalprice"), coalesce(col("prev_price"), lit(0.0))), 2).as("hi"),
            round(least(col("o_totalprice"), coalesce(col("prev_price"), col("o_totalprice"))), 2).as("lo"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  round(coalesce(prev_price, 0), 2) AS prev_or_zero,
             |  nullif(o_orderstatus, 'O') AS status_or_null,
             |  round(greatest(o_totalprice, coalesce(prev_price, 0)), 2) AS hi,
             |  round(least(o_totalprice, coalesce(prev_price, o_totalprice)), 2) AS lo
             |FROM (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice,
             |    lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS prev_price
             |  FROM orders)
             |ORDER BY o_orderkey""".stripMargin),
      "NULL-handling scalar family: coalesce/nullif/greatest/least"),

    Q(
      "q51_analytic_windows",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        orders(s, d)
          .select(
            col("o_custkey"), col("o_orderkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"),
            first(col("o_orderkey")).over(wFull).as("cheapest_order"),
            last(col("o_orderkey")).over(wFull).as("priciest_order"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  ntile(4) OVER w AS quartile,
             |  round(percent_rank() OVER w, 6) AS pct_rank,
             |  round(cume_dist() OVER w, 6) AS cume,
             |  first_value(o_orderkey) OVER wf AS cheapest_order,
             |  last_value(o_orderkey) OVER wf AS priciest_order
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
             |  wf AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin),
      "analytic window family: ntile/percent_rank/cume_dist/first/last"),

    Q(
      "q52_above_average_orders",
      (s, d) => {
        val o = orders(s, d)
        // exact decimal sum / count: a double avg is partition-order-
        // dependent, and any price inside the two engines' differing-ulp
        // interval would flip the comparison
        val avgPrice = o.agg(
          (sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") / count(lit(1)))
            .as("avg_price"))
        o.crossJoin(broadcast(avgPrice))
          .filter(col("o_totalprice") > col("avg_price"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n
             |FROM orders
             |WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |                             / count(*) FROM orders)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      "scalar subquery (uncorrelated) as a broadcast cross join"),

    Q(
      "q53_cube_segments",
      (s, d) => {
        val c = customer(s, d)
        val n = nation(s, d)
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .cube(col("n_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .select(
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            col("n_customers"))
          .orderBy(col("nation"), col("segment"))
      },
      Some("""SELECT coalesce(n_name, 'ALL') AS nation,
             |  coalesce(c_mktsegment, 'ALL') AS segment,
             |  count(*) AS n_customers
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY CUBE(n_name, c_mktsegment)
             |ORDER BY nation, segment""".stripMargin),
      "CUBE grouping sets over a broadcast dim join"),

    Q(
      "q57_status_pivot",
      (s, d) =>
        orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
            sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_pending"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
             |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
             |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
             |  CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      "manual pivot: status categories to columns in one pass"),

    Q(
      "q76_lineitem_unpivot",
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_orderkey") <= 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"))
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
            "metric", "value")
          // value in the sort: (l_orderkey, l_linenumber) is NOT unique in
          // this synthetic lineitem, so the first three keys alone leave
          // ties with engine-dependent order
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"), col("value")),
      Some("""SELECT l_orderkey, l_linenumber, metric, value
             |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
             |      FROM lineitem WHERE l_orderkey <= 100)
             |UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount))
             |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin),
      "unpivot/melt: wide metric columns to (metric, value) rows — Spark Dataset.unpivot vs SQL UNPIVOT"),

    Q(
      "q77_grouping_sets",
      (s, d) =>
        orders(s, d)
          .groupingSets(
            Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
              Seq(col("o_orderstatus")), Seq()),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            // exact decimal sum -> one double conversion: a double sum is
            // partition-order-dependent at the rounding boundary
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin),
      "explicit GROUPING SETS (finer than rollup/cube); NULLS FIRST pinned on both sides for the subtotal rows"),

    Q(
      "q78_range_frame",
      (s, d) => {
        // RANGE frame over a value (not row) window: peers within $1000 of
        // the current order's price, per status — integer-exact END TO END.
        // Ordering/framing by the double price puts the ±bound comparison on
        // float parity (boundary rows flip between engines), so the frame
        // runs over integer cents (bit-portable floor(x*100+0.5); the old
        // DECIMAL-cast idioms were adjudicated by the retired r5 probes).
        // SCALE (round 6): EXACT and fully parallel. Earlier rounds ran
        // the RANGE frame as written — a whole-table sort through the
        // 3-value o_orderstatus, tolerated only as a fenced baseline. The
        // band sum decomposes over the inclusive cumulative as
        // C(v+hw) − C(v−hw−1), so OrderStats.bandCountSum computes the
        // exact cumulative on the distinct-cents table (two-level bucketed
        // prefix sums — fact shuffles keyed on CENTS, enum-partition
        // windows only over O(price-range/W) histogram rows) and answers
        // per distinct value; one high-cardinality (status, cents) join
        // brings it back per order row. Same answer as the RANGE frame at
        // any scale. q89's coarse-bucket histogram stays as the
        // report-sized monitoring variant.
        val staged = orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            expr("CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)").as("cents"))
        val band = graft.operators.OrderStats.bandCountSum(
          staged.select(col("o_orderstatus"), col("cents")),
          Seq("o_orderstatus"), "cents", halfWidth = 100000L, bucketWidth = 100000L)
        staged
          .join(band, Seq("o_orderstatus", "cents"))
          .select(col("o_orderkey"), col("o_orderstatus"), col("cents"),
            col("n_band").as("n_near"),
            col("sum_band").as("sum_near_cents"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH c AS (
             |  SELECT o_orderkey, o_orderstatus,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders)
             |SELECT o_orderkey, o_orderstatus, cents,
             |  count(*) OVER w AS n_near,
             |  CAST(sum(cents) OVER w AS BIGINT) AS sum_near_cents
             |FROM c
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY cents
             |  RANGE BETWEEN 100000 PRECEDING AND 100000 FOLLOWING)
             |ORDER BY o_orderkey""".stripMargin),
      "value-based RANGE window frame (peers within 100000 cents of the current price), integer-exact on both engines"),

    Q(
      "q89_range_frame_hist",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // The 100 TB scale path paired with q78's exact RANGE-frame
        // baseline (the q46→q68 pattern, but oracle-able because it is
        // integer-exact): pre-aggregate orders into a $100-wide cents
        // histogram per status — ONE map-side-combined shuffle whose
        // output cardinality is O(price-range / bucket-width), independent
        // of input rows — then run the ±$1000 band window over HISTOGRAM
        // rows. The window still partitions by the 3-value status, but it
        // sorts thousands of histogram rows, not 10^11 input rows; RANGE
        // (not ROWS) so missing buckets are handled by value.
        val hist = orders(s, d)
          .select(col("o_orderstatus"),
            expr("CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)").as("cents"))
          .groupBy(col("o_orderstatus"), expr("cents DIV 10000").as("bucket"))
          .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
        val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("bucket"))
          .rangeBetween(-10L, 10L)
        hist
          .select(col("o_orderstatus"), col("bucket"), col("n_orders"), col("sum_cents"),
            sum(col("n_orders")).over(w).as("n_near"),
            sum(col("sum_cents")).over(w).as("sum_near_cents"))
          .orderBy(col("o_orderstatus"), col("bucket"))
      },
      Some("""WITH c AS (
             |  SELECT o_orderstatus,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders),
             |h AS (
             |  SELECT o_orderstatus, cents // 10000 AS bucket,
             |    count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS sum_cents
             |  FROM c GROUP BY o_orderstatus, cents // 10000)
             |SELECT o_orderstatus, bucket, n_orders, sum_cents,
             |  CAST(sum(n_orders) OVER w AS BIGINT) AS n_near,
             |  CAST(sum(sum_cents) OVER w AS BIGINT) AS sum_near_cents
             |FROM h
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY bucket
             |  RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING)
             |ORDER BY o_orderstatus, bucket""".stripMargin),
      "pre-bucketed cents histogram + band window: the fully-parallel sketch scale path paired with q78's exact baseline"),

    Q(
      "q58_ship_lag",
      (s, d) =>
        lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            round(avg(datediff(col("l_shipdate"), col("o_orderdate"))), 4).as("avg_lag_days"),
            min(datediff(col("l_shipdate"), col("o_orderdate"))).cast("long").as("min_lag"),
            max(datediff(col("l_shipdate"), col("o_orderdate"))).cast("long").as("max_lag"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
             |  round(avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))), 4) AS avg_lag_days,
             |  min(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS min_lag,
             |  max(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS max_lag
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      "date arithmetic: order-to-ship lag distribution per priority"),

    Q(
      "q59_regexp_family",
      (s, d) =>
        part(s, d)
          .filter(col("p_name").rlike("gear|bolt"))
          .select(
            col("p_partkey"),
            regexp_replace(col("p_name"), "[aeiou]", "*").as("masked"),
            regexp_extract(col("p_name"), "(\\w+)$", 1).as("last_word"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS masked,
             |  regexp_extract(p_name, '(\w+)$', 1) AS last_word
             |FROM part
             |WHERE regexp_matches(p_name, 'gear|bolt')
             |ORDER BY p_partkey""".stripMargin),
      "regexp scalar family: rlike filter, replace-all, group extract"),

    Q(
      "q60_asof_last_error",
      (s, d) => {
        val ev = events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"))
        graft.operators.AsOf
          .lastRightAtOrBefore(purchases, errors, "user_id", "ts", "last_error_ts")
          .select(col("event_id"), col("user_id"), col("last_error_ts"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |          FROM events WHERE event_type = 'purchase'),
             |e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
             |      FROM events WHERE event_type = 'error')
             |SELECT p.event_id, p.user_id, e.ts AS last_error_ts
             |FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts >= e.ts
             |ORDER BY p.event_id""".stripMargin),
      "as-of join (union+window, one shuffle, no join node) vs DuckDB's native ASOF JOIN"),

    Q(
      "q62_signup_funnel",
      (s, d) => {
        val ev = events(s, d)
        val signups = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id"))
          .agg(min(unix_micros(col("ts").cast("timestamp"))).as("signup_us"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), unix_micros(col("ts").cast("timestamp")).as("p_us"))
        signups
          .join(purchases,
            col("user_id") === col("p_user") && col("p_us") >= col("signup_us"), "left")
          .groupBy(col("user_id"), col("signup_us"))
          .agg(min(col("p_us")).as("first_purchase_us"))
          .select(
            col("user_id"),
            timestamp_micros(col("signup_us")).cast("timestamp_ntz").as("signup_ts"),
            timestamp_micros(col("first_purchase_us")).cast("timestamp_ntz").as("first_purchase_ts"),
            round((col("first_purchase_us") - col("signup_us")) / lit(60000000.0), 4)
              .as("minutes_to_convert"))
          .orderBy(col("user_id"))
      },
      Some("""WITH s AS (
             |  SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS signup_us
             |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
             |p AS (
             |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
             |  FROM events WHERE event_type = 'purchase')
             |SELECT s.user_id,
             |  make_timestamp(signup_us) AS signup_ts,
             |  make_timestamp(min(p_us)) AS first_purchase_ts,
             |  round((min(p_us) - signup_us) / 60000000.0, 4) AS minutes_to_convert
             |FROM s LEFT JOIN p ON s.user_id = p.user_id AND p.p_us >= s.signup_us
             |GROUP BY s.user_id, signup_us
             |ORDER BY s.user_id""".stripMargin),
      "conversion funnel: first signup → first subsequent purchase per user (integer-µs time math)"),

    Q(
      "q67_latest_event_per_user",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_id, event_type, value
             |FROM (
             |  SELECT user_id, event_id, event_type, value,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
             |  FROM events)
             |WHERE rn = 1
             |ORDER BY user_id""".stripMargin),
      "CDC-style upsert materialization: latest record per key by event time"),

    Q(
      "q68_approx_percentiles",
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("approx_percentile(l_extendedprice, 0.5, 1000)"), 2).as("p50_approx"),
            round(expr("percentile(l_extendedprice, 0.5)"), 2).as("p50_exact"))
          .orderBy(col("l_returnflag")),
      None,
      "approx_percentile (at-scale sketch) beside the exact value; tolerance proven in ScalaTest"),

    Q(
      "q69_null_safe_eq",
      (s, d) => {
        // stage the JSON parse through its own projection: Catalyst does not
        // CSE non-cheap expressions, so referencing get_json_object in both
        // the when() condition and the otherwise() branch parses every props
        // string twice (CollapseProject refuses to inline a non-cheap expr
        // used more than once, so the staged form parses exactly once)
        val parsed = events(s, d).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k0"))
        val withK = parsed.select(
          col("event_id"),
          when(col("k0") % 7 === 0, lit(null)).otherwise(col("k0")).as("k"))
        withK
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"))
          .filter(col("k") <=> lit(null) || col("k") <= 10)
          .orderBy(col("k").asc_nulls_first)
      },
      Some("""WITH withk AS (
             |  SELECT event_id,
             |    CASE WHEN CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) % 7 = 0
             |         THEN NULL
             |         ELSE CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) END AS k
             |  FROM events)
             |SELECT k, count(*) AS n
             |FROM withk
             |GROUP BY k
             |HAVING k IS NOT DISTINCT FROM NULL OR k <= 10
             |ORDER BY k ASC NULLS FIRST""".stripMargin),
      "null-safe equality (<=> / IS NOT DISTINCT FROM) and NULLS FIRST ordering with a NULL group"),

    Q(
      "q54_props_by_type",
      (s, d) =>
        events(s, d)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(
            round(avg(col("k")), 4).as("avg_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  round(avg(k), 4) AS avg_k, min(k) AS min_k, max(k) AS max_k
             |FROM (SELECT event_type,
             |        CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
             |      FROM events)
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin),
      "JSON extraction feeding a grouped aggregate"),

    Q(
      "q104_nation_coverage",
      (s, d) => {
        // FULL OUTER join — the one join type the inventory lacked — in its
        // natural role: dimension-coverage reconciliation between two
        // independently-aggregated sides (which nations have customers but
        // no suppliers, or vice versa). Both sides are pre-aggregated to
        // |nation| rows BEFORE the join, so the full-outer itself moves
        // only dimension-sized data no matter the fact-table scale; the
        // USING-style join key coalesces across the null sides.
        val c = customer(s, d)
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val sp = supplier(s, d)
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sp, Seq("nationkey"), "full_outer")
          .select(
            col("nationkey").cast("long").as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"),
            (col("n_cust").isNull || col("n_supp").isNull).cast("long")
              .as("coverage_gap"))
          .orderBy(col("nationkey"))
      },
      Some("""WITH c AS (
             |  SELECT c_nationkey AS nk, count(*) AS n_cust
             |  FROM customer GROUP BY 1),
             |s AS (
             |  SELECT s_nationkey AS nk, count(*) AS n_supp
             |  FROM supplier GROUP BY 1)
             |SELECT CAST(COALESCE(c.nk, s.nk) AS BIGINT) AS nationkey,
             |  COALESCE(n_cust, 0) AS n_cust,
             |  COALESCE(n_supp, 0) AS n_supp,
             |  CAST(c.nk IS NULL OR s.nk IS NULL AS BIGINT) AS coverage_gap
             |FROM c FULL OUTER JOIN s ON c.nk = s.nk
             |ORDER BY nationkey""".stripMargin),
      "FULL OUTER join as dimension-coverage reconciliation: per-nation customer vs supplier presence, pre-aggregated sides"),

    Q(
      "q109_join_key_skew",
      (s, d) =>
        // Join-key skew diagnosis — the measurement feeding
        // operators/Skew.saltedJoin's salt factor (and AQE's skew-join
        // threshold choice): per-key cardinality of the join column,
        // top-20 hottest keys. One map-side-combined groupBy then a
        // global top-k — Spark plans TakeOrderedAndProject over the agg
        // (no full sort shuffle), so the diagnosis costs one pass at any
        // scale. Boundary ties broken by key in BOTH engines; final
        // re-sort by key for the deterministic compare.
        lineitem(s, d)
          .groupBy(col("l_suppkey").cast("long").as("key"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("key"))
          .limit(20)
          .orderBy(col("key")),
      Some("""SELECT key, cnt FROM (
             |  SELECT CAST(l_suppkey AS BIGINT) AS key, count(*) AS cnt
             |  FROM lineitem
             |  GROUP BY 1
             |  ORDER BY cnt DESC, key
             |  LIMIT 20)
             |ORDER BY key""".stripMargin),
      "join-key skew diagnosis: top-20 hottest join keys by row count (feeds saltedJoin's salt factor / AQE skew thresholds); TakeOrderedAndProject, no full sort"),

    Q(
      "q126_not_in_null_aware",
      (s, d) => {
        // NOT IN <subquery> carries three-valued NULL semantics (one NULL
        // in the subquery empties the result; a NULL probe key never
        // qualifies), so Spark cannot plan a plain anti join unless both
        // sides are provably non-null — here the parquet schema declares
        // neither, forcing the NULL-AWARE anti join (PlanSpec pins the
        // shape). SCALE NOTE: null-aware anti join is broadcast-only by
        // construction; with a data-proportional build side the 100 TB
        // rewrite is the null-checked left_anti (q07's shape) after an
        // explicit IS NOT NULL on both keys — same answer when the keys
        // are in fact non-null, shuffle-joinable when they aren't tiny.
        orders(s, d).createOrReplaceTempView("q126_orders")
        customer(s, d).createOrReplaceTempView("q126_customer")
        s.sql("""SELECT o_orderpriority, count(*) AS n
                |FROM q126_orders
                |WHERE o_custkey NOT IN
                |  (SELECT c_custkey FROM q126_customer WHERE c_acctbal < 0)
                |GROUP BY o_orderpriority
                |ORDER BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority, count(*) AS n
             |FROM orders
             |WHERE o_custkey NOT IN
             |  (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      "NOT IN subquery with three-valued NULL semantics: plans as Spark's null-aware anti join (broadcast-only by construction; the documented scale rewrite is IS NOT NULL + left_anti)"),

    Q(
      "q164_kmv_distinct",
      (s, d) => {
        // MERGEABLE distinct-count sketch via K-minimum-values: the
        // cardinality profiler a 100 TB pipeline runs per partition/day
        // and MERGES, where exact count-distinct would re-shuffle raw
        // keys per reporting grain. KMV is the deterministic alternative
        // to HLL (whose register layout is engine-private — no oracle):
        // hash each key with the q136 multiplicative-mod-prime map
        // (injective for custkey < p, so "distinct hashes" IS "distinct
        // customers" here; beyond int64 products ~4e9 the xxhash64
        // bit-mixing variant applies — the q73/q136 bound family), keep
        // the K smallest per group; estimate = (K-1)*M DIV kth — pure
        // int64, exact on any engine. Merge is EXACT: the K global
        // minima each lie inside their group's K minima, so re-ranking
        // the union of per-month sketches gives the same sketch a direct
        // global pass builds — the 'ALL' row is computed ONLY from the
        // 12 monthly sketches, and the oracle builds it from the raw
        // table (the mergeability proof, hash-checked).
        //
        // SCALE: one distinct on (month, h), then K-minima selection via
        // a SALTED two-level rank (the tokenBudgetCut decomposition): the
        // per-(month, salt) window sorts 1/16 of a month's hashes, the
        // month-level merge window ranks <= 16*K pre-bounded rows. The
        // exact n_exact column is the accuracy reference a profiler
        // prints beside the estimate (itself a plain distinct-agg).
        val K = 64
        val M = 2147483629L
        val o = orders(s, d)
        val mk = (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("month_key")
        val hashes = o.select(mk,
            pmod(col("o_custkey") * lit(2654435761L), lit(M)).as("h"))
          .distinct()
        val salted = hashes.withColumn("salt", pmod(col("h"), lit(16L)))
        val w1 = Window.partitionBy(col("month_key"), col("salt")).orderBy(col("h"))
        val w2 = Window.partitionBy(col("month_key")).orderBy(col("h"))
        val monthSketch = salted
          .withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= K)
          .withColumn("rn2", row_number().over(w2)).filter(col("rn2") <= K)
          .select(col("month_key"), col("h"))
        val est = when(col("n_sketch") < K, col("n_sketch"))
          .otherwise(expr(s"(${K - 1} * ${M}L) DIV kth_hash"))
        val perMonth = monthSketch.groupBy(col("month_key"))
          .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("kth_hash"))
          .join(o.groupBy(mk).agg(countDistinct(col("o_custkey")).as("n_exact")),
            Seq("month_key"))
        // merged 'ALL' sketch: built purely from the monthly sketches
        // (<= 16*K rows in); month_key 0 sorts ahead of real yyyymm keys
        val allSketch = monthSketch.groupBy()
          .agg(slice(sort_array(collect_set(col("h"))), 1, K).as("hs"))
          .select(lit(0L).as("month_key"),
            least(size(col("hs")), lit(K)).cast("long").as("n_sketch"),
            // guard the empty-input case: element_at(_, 0) THROWS (SQL
            // array indices start at 1), so an empty orders table must
            // short-circuit to the KmvStream empty-sketch sentinel (−1)
            // instead of failing the report row (advisor r13)
            when(size(col("hs")) > 0,
              element_at(col("hs"), least(size(col("hs")), lit(K))))
              .otherwise(lit(-1L)).as("kth_hash"))
          .crossJoin(o.agg(countDistinct(col("o_custkey")).as("n_exact")))
        perMonth.unionByName(allSketch.select(perMonth.columns.map(col).toSeq: _*))
          .withColumn("est_distinct", est)
          .select(col("month_key"), col("n_exact"), col("n_sketch"),
            col("kth_hash"), col("est_distinct"))
          .orderBy(col("month_key"))
      },
      Some("""WITH h AS (
             |  SELECT DISTINCT
             |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
             |      AS month_key,
             |    (o_custkey * 2654435761) % 2147483629 AS h
             |  FROM orders),
             |sk AS (
             |  SELECT month_key, h,
             |    row_number() OVER (PARTITION BY month_key ORDER BY h) AS rn
             |  FROM h),
             |m AS (
             |  SELECT month_key,
             |    count(*) AS n_sketch, max(h) AS kth_hash
             |  FROM sk WHERE rn <= 64 GROUP BY month_key),
             |ex AS (
             |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
             |      AS month_key,
             |    count(DISTINCT o_custkey) AS n_exact
             |  FROM orders GROUP BY 1),
             |ga AS (
             |  SELECT count(*) AS n_sketch, max(h) AS kth_hash FROM (
             |    SELECT h, row_number() OVER (ORDER BY h) AS rn
             |    FROM (SELECT DISTINCT h FROM h)) WHERE rn <= 64),
             |gx AS (SELECT count(DISTINCT o_custkey) AS n_exact FROM orders)
             |SELECT m.month_key, ex.n_exact, m.n_sketch, m.kth_hash,
             |  CASE WHEN m.n_sketch < 64 THEN m.n_sketch
             |       ELSE (CAST(63 AS BIGINT) * 2147483629) // m.kth_hash END AS est_distinct
             |FROM m JOIN ex ON m.month_key = ex.month_key
             |UNION ALL
             |SELECT 0 AS month_key, gx.n_exact, ga.n_sketch, ga.kth_hash,
             |  CASE WHEN ga.n_sketch < 64 THEN ga.n_sketch
             |       ELSE (CAST(63 AS BIGINT) * 2147483629) // ga.kth_hash END AS est_distinct
             |FROM ga, gx
             |ORDER BY month_key""".stripMargin),
      "mergeable K-minimum-values distinct sketch (K=64): per-month customer-cardinality estimates via salted two-level rank, plus the 'ALL' row merged FROM the monthly sketches while the oracle builds it from raw rows — exact-merge property hash-checked; the deterministic, oracle-able stand-in for HLL"))
}
