package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between ingest and training (driver mandate; complements the dedup /
  * quality / similarity families in DocQueries, LlmQueries, Dedup):
  *
  *  - q80 stratified rebalancing sample (per-language rates);
  *  - q81 per-source document cap (the "domain cap" of web-crawl curation);
  *  - q82 int8 embedding quantization (storage/serving compression);
  *  - q83 benchmark-contamination screen (n-gram overlap vs an eval set).
  *
  * All four are single-scan / single-shuffle shapes that hold at 100 TB:
  * q80/q82 are embarrassingly parallel projections+filters, q81 shuffles
  * once on the (many-valued) source key, q83 shuffles the slim distinct
  * (doc_id, shingle) index and joins a benchmark set that is tiny by
  * construction in real deployments.
  *
  * Determinism: no rand()/sample() anywhere — sampling and priorities use
  * the q73 multiplicative-congruential hash on doc_id so both engines (and
  * any two cluster sizes) agree bit-for-bit. Same int64-overflow bound as
  * q73: doc_id < ~3.4e9, beyond which the xxhash64 variant (rows-only)
  * applies.
  */
object CurationQueries {

  /** q132's hashed-feature bucket count — a literal of the algorithm
    * (fixed model size), never of data volume, so the bucket-keyed
    * aggregate is bounded-output by construction.
    */
  private[queries] val DsirB = 256

  /** q132's per-token log-ratio contribution in integer micros — ONE
    * string parsed by Spark `expr` and interpolated verbatim into the
    * DuckDB twin (the q131 [[DocQueries.bm25Micros]] discipline: identical
    * IEEE tree, every integer cast before float math, ln portable under
    * micros flooring). Expects columns ct, cr, t_tot, r_tot in scope;
    * integer +1/+B Laplace shifts happen exactly, pre-cast.
    */
  private[queries] val dsirMicros: String =
    s"CAST(floor(ln((CAST(ct + 1 AS DOUBLE) / CAST(t_tot + $DsirB AS DOUBLE))" +
      s" / (CAST(cr + 1 AS DOUBLE) / CAST(r_tot + $DsirB AS DOUBLE)))" +
      " * 1000000 + 0.5) AS BIGINT)"

  /** Engine-portable bucket hash in [0, m): q73's multiplicative scheme,
    * but with a DIFFERENT odd multiplier (xxhash's prime2, not q73's
    * golden-ratio constant). The guarantee is deliberately modest — NOT
    * independence: (doc_id*a) mod 100 equals ((doc_id mod 100)*(a mod
    * 100)) mod 100, so this bucket and q73's are both fixed PERMUTATIONS
    * of the same residue r = doc_id mod 100 (any doc_id pattern with
    * period dividing 100 is kept or dropped wholesale). What distinct
    * multipliers DO buy is avoiding the exact-collinearity failure of
    * reusing one constant (sample ⊂ train, val/test empty) — pinned by
    * the CurationSpec composition test. Where true independence matters
    * at scale, use the documented xxhash64 bit-mixing variant instead.
    */
  private def hashBucket(m: Int) =
    pmod(col("doc_id") * lit(2246822519L), lit(m.toLong)).cast("long")

  /** Exact per-source token-budget cut via TWO-LEVEL prefix sums — the
    * "sample each source down to N tokens" curation op. Semantics: order
    * each source's docs by a deterministic hash priority (pr, doc_id) and
    * keep every doc whose EXCLUSIVE running token sum is < budget (the
    * boundary doc that crosses the budget is kept; everything after it is
    * cut).
    *
    * The naive shape is one cumulative-sum window partitioned by source —
    * fine when sources are small, but a single hot source (one domain
    * with billions of docs at 100 TB) becomes one giant per-partition
    * sort. This implementation never sorts a whole source: the priority
    * range [0, 1e6) is pre-split into `nBuckets` contiguous spans, a slim
    * (source, bkt, Σtok) aggregate classifies each span against the
    * budget — wholly-kept spans pass via a semi join with NO doc-level
    * sort, wholly-cut spans never materialize — and only the single
    * boundary span per source is refined with a doc-level window over
    * ~1/nBuckets of that source. Exactness is oracle-proven: the DuckDB
    * twin IS the naive single-window form.
    *
    * Priority multiplier 3266489917 (xxhash prime3) is distinct from the
    * q73/q80/q81 constants (see hashBucket's collinearity note); same
    * int64-overflow bound (doc_id < ~2.8e9, beyond which the xxhash64
    * bit-mixing variant applies).
    */
  def tokenBudgetCut(docs: DataFrame, budget: Long, nBuckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prRange = 1000000L
    val span = prRange / nBuckets
    val d = docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("pr", pmod(col("doc_id") * lit(3266489917L), lit(prRange)))
      .withColumn("bkt", (col("pr") / lit(span)).cast("long"))
    val buckets = d.groupBy(col("source"), col("bkt")).agg(sum(col("n_tok")).as("btok"))
    val wb = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val classed = buckets
      .withColumn("cum_before", coalesce(sum(col("btok")).over(wb), lit(0L)))
    // kept whole: even its LAST doc's exclusive prefix stays under budget
    val whole = classed.filter(col("cum_before") + col("btok") <= budget)
      .select(col("source"), col("bkt"))
    // boundary: the budget lands inside this span — refine at doc level
    val boundary = classed.filter(col("cum_before") < budget &&
        col("cum_before") + col("btok") > budget)
      .select(col("source"), col("bkt"), col("cum_before"))
    val wd = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("pr"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val refined = d.join(boundary, Seq("source", "bkt"))
      .withColumn("before",
        col("cum_before") + coalesce(sum(col("n_tok")).over(wd), lit(0L)))
      .filter(col("before") < budget)
      .select(col("doc_id"), col("source"), col("n_tok"))
    d.join(whole, Seq("source", "bkt"), "left_semi")
      .select(col("doc_id"), col("source"), col("n_tok"))
      .unionByName(refined)
  }

  val all: Seq[Q] = Seq(
    Q(
      "q80_docs_stratified_sample",
      (s, d) => {
        // Language rebalancing: downsample the dominant language (en: keep
        // 20%), keep more of the rest (60%) — the standard mixture-tuning
        // op before training. Deterministic: membership is a pure function
        // of doc_id, so the sample is reproducible run-to-run and
        // partition-layout-independent (never df.sample(), which draws
        // from a per-partition RNG stream).
        val rate = when(col("lang") === "en", lit(20L)).otherwise(lit(60L))
        documents(s, d)
          .select(col("doc_id"), col("lang"), hashBucket(100).as("bucket"),
            rate.as("rate"))
          .filter(col("bucket") < col("rate"))
          .select(col("doc_id"), col("lang"), col("bucket"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, (doc_id * 2246822519) % 100 AS bucket
             |FROM documents
             |WHERE (doc_id * 2246822519) % 100
             |  < CASE WHEN lang = 'en' THEN 20 ELSE 60 END
             |ORDER BY doc_id""".stripMargin),
      "stratified rebalancing sample: per-language keep rates via a deterministic hash independent of the q73 split buckets (no RNG)"),

    Q(
      "q81_docs_source_cap",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // Per-source cap (web-crawl "domain cap"): keep at most 15 docs per
        // source, chosen by deterministic pseudo-random priority so the cut
        // is unbiased w.r.t. doc order but fully reproducible. The window
        // partitions by source — a many-valued key (domains in the millions
        // at 100 TB), so per-group sorts stay small and parallel; NOT the
        // bounded-cardinality shape ScaleGuardSpec flags.
        val pri = pmod(col("doc_id") * lit(2654435761L), lit(1000000007L))
        val w = Window.partitionBy(col("source"))
          .orderBy(pri.asc, col("doc_id").asc)
        documents(s, d)
          .select(col("doc_id"), col("source"),
            row_number().over(w).cast("long").as("rank_in_source"))
          .filter(col("rank_in_source") <= 15)
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, source, rank_in_source FROM (
             |  SELECT doc_id, source,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY (doc_id * 2654435761) % 1000000007, doc_id) AS rank_in_source
             |  FROM documents)
             |WHERE rank_in_source <= 15
             |ORDER BY doc_id""".stripMargin),
      "per-source document cap (domain cap): top-15 per source by deterministic hash priority"),

    Q(
      "q82_emb_quantize",
      (s, d) => {
        // Symmetric int8 quantization: scale = 127/max|x|, q_i = round
        // (x_i * scale) — summarized to SCALAR integer stats (sum/min/max/
        // zero-count) because array cells break the driver's hash compare.
        // Parity: x*scale+0.5 is the same IEEE double expression tree in
        // both engines; floor() yields an integral-valued double, so the
        // int cast that follows cannot hit the trunc-vs-round divergence
        // (Spark truncates, DuckDB rounds — only visible on non-integral
        // doubles). The .5-rounding of the quantizer itself is floor(x+0.5)
        // in BOTH engines, never engine round().
        // Round 5 hardening (driver red in r4 despite a local tri-scale
        // pass — VERDICT r4 #2): the oracle's scale now divides by a
        // maxabs staged ONCE in a MATERIALIZED CTE, with a CAST(127 AS
        // DOUBLE) literal (decimal-literal division routing is
        // version-sensitive — Registry parity rules), and sum_q is CAST
        // to BIGINT against list_aggregate typing drift. Probes q94–q97
        // adjudicate the old idioms individually.
        val v = expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        val staged = embeddings(s, d)
          .select(col("vec_id"), v.as("v"))
          .select(col("vec_id"), col("v"),
            expr("array_max(transform(v, x -> abs(x)))").as("maxabs"))
          .select(col("vec_id"), col("v"),
            when(col("maxabs") > 0, lit(127.0d) / col("maxabs")).otherwise(lit(0.0d))
              .as("scale"))
          .select(col("vec_id"),
            expr("transform(v, x -> CAST(floor(x * scale + 0.5D) AS BIGINT))").as("q"))
        staged.select(
          col("vec_id"),
          expr("aggregate(q, 0L, (acc, x) -> acc + x)").as("sum_q"),
          expr("array_min(q)").as("min_q"),
          expr("array_max(q)").as("max_q"),
          expr("CAST(size(filter(q, x -> x = 0)) AS BIGINT)").as("n_zero"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |m AS MATERIALIZED (
             |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs
             |  FROM v),
             |s AS (
             |  SELECT vec_id, v,
             |    CASE WHEN maxabs > 0 THEN CAST(127 AS DOUBLE) / maxabs
             |         ELSE CAST(0 AS DOUBLE) END AS scale
             |  FROM m),
             |q AS (
             |  SELECT vec_id,
             |    list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS q
             |  FROM s)
             |SELECT vec_id,
             |  CAST(list_aggregate(q, 'sum') AS BIGINT) AS sum_q,
             |  list_min(q) AS min_q,
             |  list_max(q) AS max_q,
             |  len(list_filter(q, x -> x = 0)) AS n_zero
             |FROM q
             |ORDER BY vec_id""".stripMargin),
      "symmetric int8 embedding quantization, scalar stats (floor(x+0.5) quantizer — engine-portable rounding)"),

    Q(
      "q83_docs_contamination",
      (s, d) => {
        // Benchmark-contamination screen: fraction of each doc's distinct
        // word 8-grams that appear in the "benchmark" set (docs with
        // doc_id % 50 == 0 stand in for an eval suite). Shingles stay as
        // STRINGS here so DuckDB can replay them (the hashed variant for
        // scale is Dedup.shingleIndex); the distinct (doc_id, shingle)
        // index is the only thing shuffled, and the benchmark side of the
        // join is tiny by construction in real use (an eval suite, not a
        // corpus). Position explode, not computed-array explode (Generate
        // re-evaluates computed arrays per output row).
        val n = 8
        val base = documents(s, d).select(col("doc_id"), split(col("text"), " ").as("t"))
        val sh = graft.operators.Par.fanOut(base)
          .select(col("doc_id"), col("t"),
            explode(when(size(col("t")) >= n, sequence(lit(1), size(col("t")) - (n - 1)))
              .otherwise(array().cast("array<int>"))).as("i"))
          .select(col("doc_id"),
            concat_ws(" ", slice(col("t"), col("i"), lit(n))).as("sh"))
          .distinct()
        val bench = sh.filter(col("doc_id") % 50 === 0).select(col("sh")).distinct()
        sh.join(bench.withColumn("hit", lit(1)), Seq("sh"), "left")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_8grams"),
            count(col("hit")).as("n_contaminated"))
          .select(col("doc_id"), col("n_8grams"), col("n_contaminated"),
            round(col("n_contaminated").cast("double") / col("n_8grams").cast("double"), 4)
              .as("contam_frac"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, sh FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(range(1, len(t) - 6),
             |        i -> array_to_string(t[i:i+7], ' '))) AS sh
             |    FROM tok WHERE len(t) >= 8)),
             |bench AS (
             |  SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0)
             |SELECT s.doc_id,
             |  count(*) AS n_8grams,
             |  count(b.sh) AS n_contaminated,
             |  round(CAST(count(b.sh) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
             |    AS contam_frac
             |FROM sh s LEFT JOIN bench b ON s.sh = b.sh
             |GROUP BY s.doc_id
             |ORDER BY doc_id""".stripMargin),
      "benchmark-contamination screen: distinct word-8-gram overlap of every doc against an eval set"),

    Q(
      "q114_epoch_mixing",
      (s, d) => {
        // Epoch mixing / language up-sampling: repeat under-represented
        // languages toward the largest language's doc count, capped at 4
        // epochs (the standard "don't repeat data more than a few times"
        // rule — the multilingual rebalancing every major pretraining mix
        // documents). The repeat factor is exact ceil division — no
        // floats anywhere — and the explode materializes (doc_id,
        // copy_idx) rows, the exact list a training loader consumes. The
        // per-language counts are a map-side-combined agg; the factor
        // join back is broadcast (the language dimension is orders of
        // magnitude smaller than the corpus); only the global max
        // crosses the driver (one row, same class as the DQ report row).
        // SCALE: output rows = Σ n_docs·factor ≤ 4× corpus — linear, and
        // the explode is over a computed ≤4-element sequence per row (no
        // data-dependent blowup).
        val counts = documents(s, d)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        val maxDocs = counts.agg(max(col("n_docs"))).head().getLong(0)
        val factors = counts.select(col("lang"),
          least(expr(s"($maxDocs + n_docs - 1) DIV n_docs"), lit(4L)).as("factor"))
        documents(s, d).select(col("doc_id"), col("lang"))
          .join(broadcast(factors), Seq("lang"))
          .select(col("doc_id"), col("lang"),
            explode(sequence(lit(1L), col("factor"))).as("copy_idx"))
          .orderBy(col("doc_id"), col("copy_idx"))
      },
      Some("""WITH c AS (
             |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
             |m AS (SELECT max(n_docs) AS max_docs FROM c),
             |f AS (
             |  SELECT lang,
             |    least((max_docs + n_docs - 1) // n_docs, 4) AS factor
             |  FROM c, m)
             |SELECT doc_id, lang, CAST(copy_idx AS BIGINT) AS copy_idx
             |FROM (
             |  SELECT d.doc_id, d.lang,
             |    unnest(range(1, f.factor + 1)) AS copy_idx
             |  FROM documents d JOIN f USING (lang))
             |ORDER BY doc_id, copy_idx""".stripMargin),
      "epoch mixing: per-language repeat factors (exact ceil division toward the largest language, capped at 4) exploded into the (doc_id, copy_idx) list a training loader consumes"),

    Q(
      "q130_temperature_sample",
      (s, d) => {
        // Temperature-based source rebalancing (the mC4/multilingual
        // alpha-sampling op, alpha = 0.5): target mixture p(s) ∝
        // n_s^0.5, realized as deterministic per-doc keep rates
        // r_s = B·p(s)/n_s with output budget B = n_total/2 — large
        // sources are down-weighted toward the flattened mixture, small
        // sources keep (up to) everything. Determinism without a single
        // order-dependent float sum: the only irrational, n_s^0.5, is
        // taken as w_s = isqrt(n_s·10^6) (exact — floor of a
        // correctly-rounded IEEE sqrt of an integer < 2^52); n_total and
        // Σw are INTEGER aggregates (order-independent); the per-source
        // rate_ppm = floor(n_total·w_s·10^6 / (2·n_s·Σw)) is ONE double
        // expression over those exact integers — the identical IEEE tree
        // in both engines (the q82 floor-idiom family), computed on the
        // |sources|-row frame, never per doc — and the per-doc keep test
        // h < rate_ppm compares int64s. Doubles don't overflow, so the
        // bound is 2^53 on the integer INPUTS (doc counts), not on any
        // product — a naive all-int64 cross-multiplied test
        // (h·n_s·Σw·2 < n_total·w_s·10^6) silently wraps once the
        // largest source passes ~3·10^6 docs, exactly the scale this
        // query exists for. SCALE: one slim per-source count agg
        // (map-side combined), a 1-row totals broadcast, a rate join
        // back on the many-valued source key. Hash multiplier 374761393
        // (xxhash prime5) is distinct from the q73/q80/q81/q125
        // constants.
        val docs = documents(s, d).select(col("doc_id"), col("source"))
        val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
          .withColumn("w",
            expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE) * 1000000)) AS BIGINT)"))
        val tot = counts.agg(sum(col("n_docs")).as("n_total"), sum(col("w")).as("s_w"))
        val rates = counts.crossJoin(broadcast(tot))
          .withColumn("rate_ppm", expr(
            "CAST(floor(CAST(n_total AS DOUBLE) * CAST(w AS DOUBLE) * 1000000.0" +
              " / (2.0 * CAST(n_docs AS DOUBLE) * CAST(s_w AS DOUBLE))) AS BIGINT)"))
          .select(col("source"), col("rate_ppm"))
        docs.join(rates, "source")
          .withColumn("h", pmod(col("doc_id") * lit(374761393L), lit(1000000L)))
          .filter(col("h") < col("rate_ppm"))
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (
             |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
             |sw AS (
             |  SELECT source, n_docs,
             |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE) * 1000000)) AS BIGINT) AS w
             |  FROM c),
             |t AS (SELECT sum(n_docs) AS n_total, sum(w) AS s_w FROM sw),
             |r AS (
             |  SELECT source,
             |    CAST(floor(CAST(n_total AS DOUBLE) * CAST(w AS DOUBLE) * 1000000.0
             |      / (2.0 * CAST(n_docs AS DOUBLE) * CAST(s_w AS DOUBLE))) AS BIGINT)
             |      AS rate_ppm
             |  FROM sw CROSS JOIN t)
             |SELECT d.doc_id, d.source
             |FROM documents d JOIN r USING (source)
             |WHERE ((d.doc_id * 374761393) % 1000000) < rate_ppm
             |ORDER BY d.doc_id""".stripMargin),
      "temperature (alpha=0.5) source rebalancing toward n_s^0.5 mixture at half-corpus budget — integer isqrt weights + integer totals, one floor'd double rate per source, int64 keep test; deterministic hash keep, no overflow at any corpus size"),

    Q(
      "q125_token_budget_cut",
      (s, d) => tokenBudgetCut(documents(s, d), budget = 700L).orderBy(col("doc_id")),
      Some("""WITH d AS (
             |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
             |    (doc_id * 3266489917) % 1000000 AS pr
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, source, n_tok,
             |    COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY pr, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
             |  FROM d)
             |SELECT doc_id, source, n_tok FROM c WHERE cum_before < 700
             |ORDER BY doc_id""".stripMargin),
      "per-source token-budget cut (700 tok): two-level prefix sums — bucket-level classification keeps/cuts whole priority spans, only the boundary span gets a doc-level window — vs DuckDB's naive full window (exactness proof)"),

    Q(
      "q132_dsir_importance",
      (s, d) => {
        // DSIR-style importance weighting (Xie et al. 2023, "Data
        // Selection for Language Models via Importance Resampling",
        // public paper): per-doc log importance weight under hashed
        // unigram bag-of-words models — target distribution = the
        // lang='en' slice, raw distribution = the whole corpus, Laplace
        // +1 smoothing over B=256 hash buckets. log w(doc) =
        // Σ_tokens [ln p_target(b(tok)) − ln p_raw(b(tok))]; docs with
        // high log-w look like the target — the standard
        // quality-resampling signal. SCALE: the bucket hash is the
        // engine-portable q31 rolling hash (pure per-row expression);
        // bucket counts are ONE map-side-combined agg onto 256 keys
        // (bounded output — tiny however large the corpus); totals are a
        // 1-row cross-joined agg; each bucket's per-token contribution
        // is precomputed on the 256-row frame (the q130 rate_ppm
        // discipline — never per token) and joined back unhinted (AQE
        // broadcasts 256 rows); the per-doc agg shuffles on the
        // high-cardinality doc_id. DETERMINISM: the contribution is ONE
        // shared double expression floored to int64 micros; per-doc
        // scores are order-independent integer sums.
        val tok = documents(s, d)
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
          .withColumn("bucket",
            graft.operators.TextAnalysis.fingerprint(col("token")) % DsirB)
        val counts = tok.groupBy(col("bucket")).agg(
          count(lit(1)).as("cr"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
        val tot = counts.agg(sum(col("cr")).as("r_tot"), sum(col("ct")).as("t_tot"))
        val rates = counts.crossJoin(broadcast(tot))
          .withColumn("contrib_micros", expr(dsirMicros))
          .select(col("bucket"), col("contrib_micros"))
        tok.join(rates, "bucket")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tok"), sum(col("contrib_micros")).as("logw_micros"))
          .select(col("doc_id"), col("n_tok"), col("logw_micros"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tok AS (
             |  SELECT doc_id, lang, token,
             |    list_reduce(list_transform(string_split(token, ''),
             |        c -> CAST(unicode(c) AS BIGINT)),
             |      (a, b) -> (a * 31 + b) % 1000000000000000) % $DsirB AS bucket
             |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
             |        FROM documents)
             |  WHERE token <> ''),
             |c AS (
             |  SELECT bucket, count(*) AS cr,
             |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
             |  FROM tok GROUP BY bucket),
             |t AS (
             |  SELECT CAST(sum(cr) AS BIGINT) AS r_tot,
             |    CAST(sum(ct) AS BIGINT) AS t_tot FROM c),
             |r AS (SELECT bucket, $dsirMicros AS contrib_micros FROM c CROSS JOIN t)
             |SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             |  CAST(sum(contrib_micros) AS BIGINT) AS logw_micros
             |FROM tok JOIN r USING (bucket)
             |GROUP BY tok.doc_id
             |ORDER BY doc_id""".stripMargin),
      "DSIR-style importance weights: hashed-unigram (B=256, portable rolling hash) Laplace-smoothed log-ratio of the lang='en' target model vs the raw-corpus model, per-doc integer-micros sum — bounded bucket agg + 256-row contribution broadcast, doc-keyed final agg"),

    Q(
      "q136_training_order",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // Deterministic global shuffle for training order: every epoch's
        // data loader must read the corpus in a pseudo-random order that
        // is REPRODUCIBLE (resume from step N) and computable without a
        // global sort. Shard = multiplicative hash of doc_id (spreads
        // near-dup id runs across shards); within-shard position =
        // row_number over a SECOND independent multiplicative hash, ties
        // to doc_id. SCALE: the q99 sharding argument — shard count is a
        // free parameter (thousands at 100 TB), each shard's window is an
        // independent task, and no global ORDER BY exists anywhere in the
        // plan; the final orderBy here is presentation-only for the
        // oracle diff. Engine-portable arithmetic: products stay in int64
        // for doc_id < ~4e9 (the q73 bound family). The order-key modulus
        // is a ~2^31 prime so even at the id bound the expected tie-group
        // is ~2 docs — a small modulus (the r8 review caught a 1e6 draft)
        // would degrade the "shuffle" into doc_id-sorted runs at scale,
        // exactly the ingestion-order correlation this op exists to break.
        val shards = 16L
        // shard: reduce the product mod a ~2^31 PRIME first, then mod 16.
        // An odd multiplier mod a power of two only permutes doc_id mod 16
        // (the product's low 4 bits depend only on doc_id's low 4 bits), so
        // the r8-advice draft was effectively round-robin — any ingestion
        // pattern correlated with doc_id mod 16 mapped straight through.
        // The prime reduction mixes high product bits into the residue, so
        // shard membership is genuinely scrambled.
        val shard = pmod(
          pmod(col("doc_id") * lit(2654435761L), lit(2147483629L)), lit(shards))
        val ordKey = pmod(col("doc_id") * lit(2246822519L), lit(2147483629L))
        val w = Window.partitionBy(col("shard"))
          .orderBy(col("ord_key"), col("doc_id"))
        documents(s, d)
          .select(col("doc_id"), shard.as("shard"), ordKey.as("ord_key"))
          .withColumn("pos", row_number().over(w).cast("long"))
          .select(col("doc_id"), col("shard"), col("ord_key"), col("pos"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    ((doc_id * 2654435761) % 2147483629) % 16 AS shard,
             |    (doc_id * 2246822519) % 2147483629 AS ord_key
             |  FROM documents)
             |SELECT doc_id, shard, ord_key,
             |  CAST(row_number() OVER (PARTITION BY shard
             |    ORDER BY ord_key, doc_id) AS BIGINT) AS pos
             |FROM t
             |ORDER BY doc_id""".stripMargin),
      "deterministic epoch-shuffle order: multiplicative-hash shard + independent-hash within-shard position — reproducible loader order with shard-local windows only, no global sort (shard count is the scale dial, q99's argument)"),

    Q(
      "q139_uniform_sample",
      (s, d) => {
        // Fixed-budget uniform corpus sample (eval slices, ablation
        // subsets, human-review batches): the N docs with the smallest
        // multiplicative-hash priority, ties to doc_id. Deterministic and
        // engine-portable where rand()-based sampling is neither, and —
        // unlike a per-source rate (q80) or temperature mix (q130) — the
        // budget is EXACT. SCALE: a top-k by priority plans as
        // TakeOrderedAndProject (per-partition heaps + driver merge of
        // N-row results), never a global sort; the q14 shape over a
        // computed key. Multiplier is a distinct member of the q73 bound
        // family (doc_id < ~2.8e9 keeps the product in int64); the
        // priority modulus is a ~2^31 prime so buckets hold ~1 doc even
        // at the id bound — with a small modulus (the r8 review caught a
        // 1e6 draft) ties would resolve to the LOWEST doc_ids and the
        // "uniform" sample would concentrate in early-crawled ids.
        val n = 200
        documents(s, d)
          .select(col("doc_id"),
            pmod(col("doc_id") * lit(3266489917L), lit(2147483629L)).as("pri"))
          .orderBy(col("pri"), col("doc_id"))
          .limit(n)
      },
      Some("""SELECT doc_id, (doc_id * 3266489917) % 2147483629 AS pri
             |FROM documents
             |ORDER BY pri, doc_id
             |LIMIT 200""".stripMargin),
      "fixed-budget deterministic uniform sample: top-200 by multiplicative-hash priority, ties to doc_id — exact budget, reproducible, plans as TakeOrderedAndProject (no global sort)"))
}
