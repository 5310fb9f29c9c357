package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Relational parity inventory over the TPC-H-ish star schema (SURVEY.md
  * §2.3–§2.6): grouped aggregation, equi/left/semi/anti joins (broadcast for
  * dims), ranking + frame + offset windows, rollup, set ops, top-k, and the
  * scalar-function families (string/date/math). The reference delegates all
  * of this to Spark built-ins (the reference spark_jobs python files have no
  * joins or groupBy at all — SURVEY §2.4), so each query is pure DataFrame API and
  * Catalyst owns the plan.
  */
object StarQueries {

  val all: Seq[Q] = Seq(
    Q(
      "q01_pricing_summary",
      // Money sums go through EXACT decimal arithmetic (double sums are
      // partition-order-dependent; rounding them sits one ulp from
      // flipping — the class of bug the sf0.001 soak caught in q46/q71):
      // 2dp prices sum as decimal(18,2); the price*(1-disc) product is
      // exactly 4dp in decimal; avg_disc is exact-sum / count. Only the
      // integer-valued l_quantity keeps plain double aggregation.
      (s, d) => {
        val price = col("l_extendedprice").cast("decimal(18,2)")
        val disc  = col("l_discount").cast("decimal(18,2)")
        lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            sum(price).cast("double").as("sum_base_price"),
            sum(price * (lit(1).cast("decimal(18,2)") - disc)).cast("double").as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            (sum(disc).cast("double") / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      "TPC-H Q1-style pricing summary: hash agg with map-side partials; exact decimal money sums"),

    Q(
      "q02_filter_pushdown",
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_quantity") >= 48 && col("l_discount") > 0.05)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), col("l_shipdate"))
          // (l_orderkey, l_linenumber) is NOT unique in this synthetic
          // lineitem — extend the sort to a total order so tied rows can't
          // flip the ordered hash between engines
          .orderBy(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"), col("l_quantity")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
             |FROM lineitem
             |WHERE l_quantity >= 48 AND l_discount > 0.05
             |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity""".stripMargin),
      "selection + projection; predicates and column pruning reach the parquet scan"),

    Q(
      "q03_segment_revenue",
      (s, d) => {
        // Aggregate BEFORE the shuffle join (r16, guide §2.3): the fact
        // side pre-sums revenue per l_orderkey, so the join carries one
        // slim aggregated row per order instead of every lineitem, and
        // the per-segment countDistinct(o_orderkey) — a second
        // (segment, orderkey)-keyed aggregation pass in the old plan —
        // degenerates to a plain count over the now-unique orderkeys.
        // Decimal sums are exact and associative, so the sum-of-presums
        // is bit-identical to the direct sum (the oracle SQL is
        // unchanged; the driver hash-checks equality); inner-join
        // semantics are unchanged (pre-agg keeps exactly the orderkeys
        // that had lineitems).
        val li = lineitem(s, d)
        val o  = orders(s, d)
        val c  = customer(s, d)
        val perOrder = li.groupBy(col("l_orderkey"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .as("rev"))
        perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            sum(col("rev")).cast("double").as("revenue"),
            count(col("o_orderkey")).as("n_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             |  count(DISTINCT o_orderkey) AS n_orders
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin),
      "3-way equi join (fact-to-fact shuffle join + dim join) then grouped agg"),

    Q(
      "q04_brand_volume",
      (s, d) =>
        // part scales with SF (unlike region/nation), so no forced broadcast
        // hint: AQE broadcasts it while it fits autoBroadcastJoinThreshold
        // and falls back to a shuffle join at scale.
        lineitem(s, d)
          .join(part(s, d), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            count(lit(1)).as("n_items"))
          .orderBy(col("p_brand")),
      Some("""SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_items
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand
             |ORDER BY p_brand""".stripMargin),
      "explicit broadcast-hash join of the small dim — no shuffle of the fact side"),

    Q(
      "q05_customer_order_stats",
      (s, d) =>
        customer(s, d)
          .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            coalesce(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), lit(0.0))
              .as("total_spent"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
             |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0) AS total_spent
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey, c_name
             |ORDER BY c_custkey""".stripMargin),
      "left outer join preserving customers with zero orders"),

    Q(
      "q06_customers_with_orders",
      (s, d) =>
        customer(s, d)
          .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      "left-semi join (EXISTS)"),

    Q(
      "q07_customers_without_orders",
      (s, d) =>
        customer(s, d)
          .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin),
      "left-anti join (NOT EXISTS) — customers with no urgent order (non-empty at every sf)"),

    Q(
      "q08_top_orders_per_customer",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin),
      "ranking window: top-3 orders per customer, deterministic tie-break"),

    Q(
      "q09_running_total",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders(s, d)
          .withColumn("running_total",
            sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("running_total"))
          .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
             |FROM orders
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin),
      "frame window: per-customer running spend (exact decimal frame sum)"),

    Q(
      "q10_order_deltas",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        orders(s, d)
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("delta", round(col("o_totalprice") - col("prev_price"), 2))
          .withColumn("seq", row_number().over(w).cast("long"))
          .select(col("o_custkey"), col("seq"), col("o_orderkey"), col("prev_price"), col("delta"))
          .orderBy(col("o_custkey"), col("seq"))
      },
      Some("""SELECT o_custkey, seq, o_orderkey, prev_price,
             |  round(o_totalprice - prev_price, 2) AS delta
             |FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS prev_price,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS seq
             |  FROM orders)
             |ORDER BY o_custkey, seq""".stripMargin),
      "offset window (lag) with NULL first row per partition"),

    Q(
      "q11_region_rollup",
      (s, d) => {
        val c = customer(s, d)
        val n = nation(s, d)
        val r = region(s, d)
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_acctbal"))
          .select(
            coalesce(col("r_name"), lit("ALL")).as("region"),
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            col("n_customers"), col("sum_acctbal"))
          .orderBy(col("region"), col("nation"))
      },
      Some("""SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
             |  count(*) AS n_customers,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP(r_name, n_name)
             |ORDER BY region, nation""".stripMargin),
      "hierarchical rollup over two broadcast dim joins"),

    Q(
      "q12_custkeys_no_big_order",
      (s, d) => {
        val o = orders(s, d)
        o.select(col("o_custkey").as("custkey"))
          .except(o.filter(col("o_totalprice") > 300000)
            .select(col("o_custkey").as("custkey")))
          .orderBy(col("custkey"))
      },
      Some("""SELECT o_custkey AS custkey FROM orders
             |EXCEPT
             |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
             |ORDER BY custkey""".stripMargin),
      "set op: EXCEPT (distinct semantics) — customers ordering but never above 300k"),

    Q(
      "q13_nations_both",
      (s, d) =>
        customer(s, d).select(col("c_nationkey").as("nationkey"))
          .intersect(supplier(s, d).select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin),
      "set op: INTERSECT"),

    Q(
      "q14_top20_orders",
      (s, d) =>
        orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
             |FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 20""".stripMargin),
      "global top-k: Spark plans TakeOrderedAndProject (no full sort shuffle)"),

    Q(
      "q15_part_strings",
      (s, d) =>
        part(s, d)
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            substring(col("p_name"), 1, 8).as("name_prefix"),
            length(col("p_name")).cast("long").as("name_len"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
          .filter(col("p_size") >= 25)
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
             |  substring(p_name, 1, 8) AS name_prefix,
             |  length(p_name) AS name_len,
             |  concat_ws('|', p_brand, p_type) AS brand_type
             |FROM part WHERE p_size >= 25
             |ORDER BY p_partkey""".stripMargin),
      "string scalar family: upper/substring/length/concat_ws"),

    Q(
      "q16_orders_by_month",
      (s, d) =>
        orders(s, d)
          .groupBy(
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("monthly_total"))
          .orderBy(col("yr"), col("mo")),
      Some("""SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             |  count(*) AS n_orders,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monthly_total
             |FROM orders
             |GROUP BY year(o_orderdate), month(o_orderdate)
             |ORDER BY yr, mo""".stripMargin),
      "date scalar family + grouped agg on derived keys"),

    Q(
      "q17_math_scalars",
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_orderkey") % 100 === 0)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
            round(log(col("l_extendedprice")), 4).as("ln_price"),
            ceil(col("l_discount") * 100).as("disc_pct_ceil"),
            floor(col("l_tax") * 100).as("tax_pct_floor"),
            abs(col("l_quantity") - lit(25)).as("qty_dev"))
          // sqrt_price tie-breaks the non-unique (l_orderkey, l_linenumber)
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("sqrt_price")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  round(sqrt(l_extendedprice), 4) AS sqrt_price,
             |  round(ln(l_extendedprice), 4) AS ln_price,
             |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
             |  CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
             |  abs(l_quantity - 25) AS qty_dev
             |FROM lineitem WHERE l_orderkey % 100 = 0
             |ORDER BY l_orderkey, l_linenumber, sqrt_price""".stripMargin),
      "math scalar family: sqrt/ln/ceil/floor/abs (int widths matched to DuckDB)"),

    Q(
      "q112_bloom_semi_join",
      (s, d) => {
        // Bloom-prefiltered semi join (operators/BloomJoin): the fact
        // table is filtered by a ~MB broadcast Bloom sketch of the hot
        // orders' keys BEFORE its exchange, then an exact LEFT SEMI join
        // removes the sketch's false positives — so the answer is
        // bit-equal to the plain `IN` subquery the oracle runs, and the
        // sketch is purely a shuffle-volume lever. This is the explicit,
        // author-controlled form of Spark's InjectRuntimeFilter (which
        // won't fire when it can't estimate the build side's
        // selectivity). At 100 TB the >450k predicate keeps ~10% of
        // orders, so ~90% of lineitem never enters the join exchange.
        val hot = orders(s, d)
          .where(col("o_totalprice") > 450000.0d)
          .select(col("o_orderkey"))
        graft.operators.BloomJoin
          .semiJoin(lineitem(s, d), hot, "l_orderkey", "o_orderkey",
            expectedItems = 200000L)
          .select(col("l_returnflag"),
            expr("CAST(floor(l_extendedprice * 100.0D + 0.5D) AS BIGINT)").as("cents"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("cents")).as("sum_cents"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  count(*) AS n_items,
             |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM lineitem
             |WHERE l_orderkey IN (
             |  SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin),
      "Bloom-prefiltered semi join (BloomJoin.semiJoin): sketch cuts the probe side pre-shuffle, exact semi join removes false positives — bit-equal to the plain IN subquery"))
}
