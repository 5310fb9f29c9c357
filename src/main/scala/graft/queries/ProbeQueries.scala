package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._

/** TEMPORARY round-5 diagnostic probes (q90–q97) — DELETE once adjudicated.
  *
  * CORRECTNESS_r04 marks exactly two rows red (q78_range_frame,
  * q82_emb_quantize, both `hash_match:false` with rows+schema green) while
  * the same binaries pass the local DuckDB 1.0.0 tri-scale soak bit-exact.
  * The divergence therefore lives in the DRIVER's (newer) DuckDB build and
  * cannot be reproduced locally. Each probe below isolates ONE candidate
  * idiom from those two queries into a tiny query whose driver pass/fail in
  * CORRECTNESS_r05 adjudicates that idiom directly:
  *
  *   q90 double→DECIMAL(18,6) cast → micros      (q78's old cents staging)
  *   q91 half-away `//` integer division          (q78's old cents rounding)
  *   q92 RANGE frame machinery on portable ints   (q78's window itself)
  *   q93 raw parquet doubles passed through       (q78's old output column)
  *   q94 `127.0 / x` decimal-literal division     (q82's old scale expr)
  *   q95 `CAST(127 AS DOUBLE) / x` division       (q82's hedged scale expr)
  *   q96 list_transform/floor/list_aggregate, Ø ÷ (q82's list machinery)
  *   q97 abs + list_max maxabs path               (q82's scale denominator)
  *
  * Sensitivity: aggregate probes emit count + sum + bit_xor over the full
  * derived column — any single-value divergence flips the xor (and almost
  * surely the sum), so a 1-row result localizes as sharply as a full dump.
  * All integer outputs; DuckDB sum() is HUGEINT → CAST AS BIGINT per the
  * Registry parity rules.
  */
object ProbeQueries {

  /** Shared DuckDB prelude: per-vector doubles for the q82-family probes. */
  private val vCte = "WITH v AS (\n  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"

  val all: Seq[Q] = Seq(
    Q(
      "q90_probe_dec_cast",
      (s, d) =>
        orders(s, d)
          .select((col("o_totalprice").cast("decimal(18,6)") * 1000000)
            .cast("long").as("micros"))
          .agg(count(lit(1)).as("n"), sum(col("micros")).as("s_micros"),
            expr("bit_xor(micros)").as("x_micros")),
      Some("""SELECT count(*) AS n,
             |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS s_micros,
             |  bit_xor(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS x_micros
             |FROM orders""".stripMargin),
      "PROBE: double→decimal(18,6)→int64-micros cast (q78's old cents staging; green-precedent q71 uses it on events.value)"),

    Q(
      "q91_probe_cents_div",
      (s, d) =>
        orders(s, d)
          .select((col("o_totalprice").cast("decimal(18,6)") * 1000000)
            .cast("long").as("micros"))
          .select(expr("(2 * micros + 10000) DIV 20000").as("cents"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("s_cents"),
            expr("bit_xor(cents)").as("x_cents")),
      Some("""WITH c AS (
             |  SELECT (2 * CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT) + 10000) // 20000 AS cents
             |  FROM orders)
             |SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS s_cents,
             |  bit_xor(cents) AS x_cents
             |FROM c""".stripMargin),
      "PROBE: half-away-from-zero integer DIV cents rounding on top of the micros cast (q78's old rounding step)"),

    Q(
      "q92_probe_range_frame",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // Frame machinery in isolation: cents derived via the bit-portable
        // floor(x*100+0.5) idiom (q85's green fixed-point precedent), so a
        // red here indicts the RANGE window evaluation itself.
        val staged = orders(s, d).select(col("o_orderstatus"),
          expr("CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)").as("cents"))
        val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("cents"))
          .rangeBetween(-100000L, 100000L)
        staged
          .select(count(lit(1)).over(w).as("n_near"),
            sum(col("cents")).over(w).as("sum_near"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_near")).as("s_n_near"), expr("bit_xor(n_near)").as("x_n_near"),
            sum(col("sum_near")).as("s_sum_near"), expr("bit_xor(sum_near)").as("x_sum_near"))
      },
      Some("""WITH c AS (
             |  SELECT o_orderstatus,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM orders),
             |w AS (
             |  SELECT count(*) OVER win AS n_near,
             |    CAST(sum(cents) OVER win AS BIGINT) AS sum_near
             |  FROM c
             |  WINDOW win AS (PARTITION BY o_orderstatus ORDER BY cents
             |    RANGE BETWEEN 100000 PRECEDING AND 100000 FOLLOWING))
             |SELECT count(*) AS n,
             |  CAST(sum(n_near) AS BIGINT) AS s_n_near, bit_xor(n_near) AS x_n_near,
             |  CAST(sum(sum_near) AS BIGINT) AS s_sum_near, bit_xor(sum_near) AS x_sum_near
             |FROM w""".stripMargin),
      "PROBE: value-RANGE window frame over portable integer cents (q78's frame machinery, decimal cast removed)"),

    Q(
      "q93_probe_double_col",
      (s, d) =>
        orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey")).limit(100),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_orderkey LIMIT 100""".stripMargin),
      "PROBE: raw parquet doubles passed through untouched (q78's old o_totalprice output column; both sides read the same bits)"),

    Q(
      "q94_probe_dec_literal_div",
      (s, d) =>
        quantizerSums(s, d),
      Some(s"""$vCte,
             |s AS (
             |  SELECT vec_id, v,
             |    CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
             |         THEN 127.0 / list_max(list_transform(v, x -> abs(x)))
             |         ELSE 0.0 END AS scale
             |  FROM v),
             |q AS (
             |  SELECT vec_id,
             |    CAST(list_aggregate(list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT)), 'sum') AS BIGINT) AS sum_q
             |  FROM s)
             |SELECT count(*) AS n, CAST(sum(sum_q) AS BIGINT) AS s_q,
             |  bit_xor(sum_q) AS x_q
             |FROM q""".stripMargin),
      "PROBE: q82's OLD oracle shape — scale via the 127.0 DECIMAL literal division (decimal→double routing suspect)"),

    Q(
      "q95_probe_double_literal_div",
      (s, d) =>
        quantizerSums(s, d),
      Some(s"""$vCte,
             |m AS MATERIALIZED (
             |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM v),
             |s AS (
             |  SELECT vec_id, v,
             |    CASE WHEN maxabs > 0 THEN CAST(127 AS DOUBLE) / maxabs
             |         ELSE CAST(0 AS DOUBLE) END AS scale
             |  FROM m),
             |q AS (
             |  SELECT vec_id,
             |    CAST(list_aggregate(list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT)), 'sum') AS BIGINT) AS sum_q
             |  FROM s)
             |SELECT count(*) AS n, CAST(sum(sum_q) AS BIGINT) AS s_q,
             |  bit_xor(sum_q) AS x_q
             |FROM q""".stripMargin),
      "PROBE: q82's HEDGED oracle shape — CAST(127 AS DOUBLE) division + materialized maxabs (identical Spark side to q94)"),

    Q(
      "q96_probe_list_agg",
      (s, d) =>
        embeddings(s, d)
          .select(col("vec_id"),
            expr("aggregate(transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64.0D + 0.5D) AS BIGINT)), 0L, (acc, y) -> acc + y)")
              .as("sum_q"))
          .agg(count(lit(1)).as("n"), sum(col("sum_q")).as("s_q"),
            expr("bit_xor(sum_q)").as("x_q")),
      Some("""WITH q AS (
             |  SELECT vec_id,
             |    list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
             |      x -> CAST(floor(x * 64 + 0.5) AS BIGINT)), 'sum') AS sum_q
             |  FROM embeddings)
             |SELECT count(*) AS n, CAST(sum(sum_q) AS BIGINT) AS s_q,
             |  bit_xor(sum_q) AS x_q
             |FROM q""".stripMargin),
      "PROBE: list_transform + floor + CAST + raw list_aggregate('sum') with NO division (x*64 is exponent-exact)"),

    Q(
      "q97_probe_maxabs",
      (s, d) =>
        embeddings(s, d)
          .select(expr("CAST(floor(array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) * 1048576.0D) AS BIGINT)")
            .as("m_fx"))
          .agg(count(lit(1)).as("n"), sum(col("m_fx")).as("s_m"),
            expr("bit_xor(m_fx)").as("x_m")),
      Some("""WITH m AS (
             |  SELECT CAST(floor(list_max(list_transform(CAST(embedding AS DOUBLE[]),
             |    x -> abs(x))) * 1048576) AS BIGINT) AS m_fx
             |  FROM embeddings)
             |SELECT count(*) AS n, CAST(sum(m_fx) AS BIGINT) AS s_m,
             |  bit_xor(m_fx) AS x_m
             |FROM m""".stripMargin),
      "PROBE: abs + list_max denominator path, scaled by 2^20 (exponent-exact: maxabs is an exact float value)"))

  /** Spark side shared by q94/q95 — the two probes differ ONLY in the
    * DuckDB literal/staging idiom; Spark computes one double `scale` whose
    * value both SQL forms must reproduce.
    */
  private def quantizerSums(s: SparkSession, d: String) =
    embeddings(s, d)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .select(col("vec_id"), col("v"),
        expr("array_max(transform(v, x -> abs(x)))").as("maxabs"))
      .select(col("vec_id"), col("v"),
        when(col("maxabs") > 0, lit(127.0d) / col("maxabs")).otherwise(lit(0.0d))
          .as("scale"))
      .select(col("vec_id"),
        expr("aggregate(transform(v, x -> CAST(floor(x * scale + 0.5D) AS BIGINT)), 0L, (acc, y) -> acc + y)")
          .as("sum_q"))
      .agg(count(lit(1)).as("n"), sum(col("sum_q")).as("s_q"),
        expr("bit_xor(sum_q)").as("x_q"))
}
