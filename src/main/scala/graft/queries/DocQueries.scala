package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** LLM-training-data text operators over the `documents` table (driver
  * mandate, BASELINE.json north_star): exact dedup, token statistics,
  * per-language profiling, and quality scoring. All built-in expressions
  * (split / array higher-order functions) so the whole thing stays inside
  * whole-stage codegen; at 100 TB these are embarrassingly parallel scans
  * except the dedup groupBy, which shuffles on the text hash only.
  */
object DocQueries {

  /** Tokens of the space-separated `text` column. */
  private val toks = split(col("text"), " ")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Gopher-gate thresholds — the single source of truth for q75's
    * keep_flag AND q129's funnel stages (CurationSpec pins the identity;
    * these constants make it structural). Interpolated into BOTH engines'
    * texts so the four copies cannot drift.
    */
  private val MinTok = 10
  private val MaxTok = 5000
  private val StopFloor = 0.02
  private val DupCeil = 0.2

  /** q131's fixed query-term set (a literal in the plan — the operator is
    * "retrieve for ONE query"; a query BATCH would broadcast a terms table
    * instead, same plan shape).
    */
  private[graft] val bm25Terms = Seq("spark", "merge", "window")

  /** Per-(doc, term) BM25 contribution in integer micros — ONE string,
    * parsed by Spark's `expr` and interpolated verbatim into the DuckDB
    * twin, so the IEEE expression tree cannot differ between engines.
    * Every integer column is cast to DOUBLE before entering float math
    * (the decimal-literal routing hazard in [[Q]]'s scaladoc); ln of the
    * Lucene idf form is engine-portable under micros flooring (q61
    * precedent). Expects columns tf, df, dl, n_docs, tot_dl in scope.
    * `private[graft]`: also the scoring tree of the STORED lexical
    * index's probe (`operators.Lexical` — r13 verdict #1), which is what
    * lets the stored path carry q131's full-parity oracle.
    */
  private[graft] val bm25Micros: String =
    "CAST(floor(ln(1 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)" +
      " / (CAST(df AS DOUBLE) + 0.5)) * CAST(tf AS DOUBLE) * 2.2" +
      " / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)" +
      " / (CAST(tot_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))" +
      " * 1000000 + 0.5) AS BIGINT)"

  /** q131's full oracle SQL, parameterized over the document source
    * relation — ONE copy serving the recompute path (q131), the stored
    * probe (q169, identical corpus → identical SQL) and the TOMBSTONED
    * stored probe (q171, `src` = the surviving-docs subquery: df, N and
    * total length all shrink exactly, so even deletion carries full
    * DuckDB parity).
    */
  private[queries] def bm25OracleSql(src: String = "documents"): String =
    s"""WITH dl AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM $src),
       |st AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_dl FROM dl),
       |tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM $src)
       |  WHERE token IN (${bm25Terms.map("'" + _ + "'").mkString(", ")})
       |  GROUP BY doc_id, token),
       |dfc AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
       |sc AS (
       |  SELECT tf.doc_id, $bm25Micros AS c_micros
       |  FROM tf JOIN dfc USING (token) JOIN dl USING (doc_id) CROSS JOIN st)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit,
       |  CAST(sum(c_micros) AS BIGINT) AS score_micros
       |FROM sc GROUP BY doc_id
       |ORDER BY score_micros DESC, doc_id
       |LIMIT 20""".stripMargin

  /** q133's per-bigram-instance log-prob contribution in integer micros —
    * the [[bm25Micros]] shared-string discipline. COALESCE(…, 0) folds the
    * left-join misses (bigram/left-word unseen in the model slice) into
    * the Laplace smoothing. Expects columns c12, c1, v_sz in scope.
    */
  private[queries] val bigramLmMicros: String =
    "CAST(floor(ln(CAST(COALESCE(c12, 0) + 1 AS DOUBLE)" +
      " / CAST(COALESCE(c1, 0) + v_sz AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"

  /** q148's per-token naive-Bayes log-odds in integer micros — the
    * [[bm25Micros]] shared-string discipline: Laplace-smoothed
    * ln(p(tok|keep)) − ln(p(tok|drop)) with the vocabulary size as the
    * smoothing denominator. Expects columns pos_c, neg_c, pos_tot,
    * neg_tot, v_sz in scope.
    */
  private[queries] val nbTokenMicros: String =
    "CAST(floor((ln(CAST(pos_c + 1 AS DOUBLE) / CAST(pos_tot + v_sz AS DOUBLE))" +
      " - ln(CAST(neg_c + 1 AS DOUBLE) / CAST(neg_tot + v_sz AS DOUBLE)))" +
      " * 1000000 + 0.5) AS BIGINT)"

  /** q148's class-prior log-odds in integer micros (add-one smoothed).
    * Expects columns n_pos, n_neg in scope.
    */
  private[queries] val nbPriorMicros: String =
    "CAST(floor((ln(CAST(n_pos + 1 AS DOUBLE) / CAST(n_pos + n_neg + 2 AS DOUBLE))" +
      " - ln(CAST(n_neg + 1 AS DOUBLE) / CAST(n_pos + n_neg + 2 AS DOUBLE)))" +
      " * 1000000 + 0.5) AS BIGINT)"

  /** q135's per-distinct-char entropy contribution −p·ln(p) in integer
    * micros — the [[bm25Micros]] shared-string discipline. Expects a char
    * count `c` and the doc's total char count `n_ch` in scope (in Spark,
    * `c` is the aggregate-lambda variable). p = 1 contributes
    * floor(-0.0 + 0.5) = 0 identically in both engines.
    */
  private[queries] val charEntropyMicros: String =
    "CAST(floor(-(CAST(c AS DOUBLE) / CAST(n_ch AS DOUBLE))" +
      " * ln(CAST(c AS DOUBLE) / CAST(n_ch AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"

  /** Per-(session, dir) build-once artifact memo — the StoredIndexes
    * discipline for NON-catalog artifacts (parquet under a deterministic
    * tmp path, rebuilt per session, overwritten in place across
    * sessions): q162's stored BPE vocabulary, and the shared q148/q151
    * NB-scored frame (r12 verdict #5 — q151 used to re-run q148's whole
    * fit; the scored frame is exact integers, so the parquet round-trip
    * is bit-identical to recomputation and both oracles stay green).
    * Keyed by session-UUID string (no session pinning — Tables.sessionKey)
    * and the raw dir.
    */
  private val artifactMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), String]()

  private def artifact(s: org.apache.spark.sql.SparkSession, d: String,
      kind: String)(build: String => Unit): String =
    artifactMemo.computeIfAbsent((graft.Tables.sessionKey(s), d, kind), _ => {
      val h = java.security.MessageDigest.getInstance("SHA-1")
        .digest(d.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
      val p = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), s"graft_${kind}_$h").toString
      build(p)
      p
    })

  /** The stored BPE tokenizer artifact for q162: q155's 3 trained merges
    * + the derived (token, id) vocabulary, built once per (session, dir).
    */
  private def bpeVocabPath(s: org.apache.spark.sql.SparkSession, d: String): String =
    artifact(s, d, "bpevocab") { p =>
      graft.operators.Bpe.storeVocab(documents(s, d),
        graft.operators.Bpe.train(documents(s, d), rounds = 3), p)
    }

  /** The q148/q151 shared NB-scored frame (see [[artifact]]). */
  private def nbScoredShared(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val p = artifact(s, d, "nbscored") { p =>
      nbScored(documents(s, d)).write.mode("overwrite").parquet(p)
    }
    s.read.parquet(p)
  }

  /** q155's DuckDB twin, generated for `k` unrolled merge rounds. Each
    * round reads the previous round's token lists (cur_{r-1}), counts
    * adjacent pairs, takes the (cnt DESC, l, r) winner, and rebuilds the
    * lists with the GREEDY left-to-right merge applied — expressed as
    * gaps-and-islands parity: candidate positions (where t[i..i+1] =
    * winner) group into runs of consecutive i; within a run the 1st,
    * 3rd, 5th … merge and each consumes positions {i, i+1}. This is
    * exactly the one-pass greedy rule Spark's fold implements (a merge
    * at i kills the candidate at i+1 and leaves i+2 live — run parity).
    */
  private def bpeTrainOracleSql(k: Int): String = {
    val rounds = bpeRoundCtes(k)
    val unions = (1 to k).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, l, r, cnt FROM top_$r")
      .mkString("\n  UNION ALL ")
    s"""${bpeRoundsWith(rounds)}
       |SELECT * FROM (
       |  $unions)
       |ORDER BY round""".stripMargin
  }

  private def bpeRoundCtes(k: Int): String = {
    (1 to k).map { r =>
      val prev = s"cur_${r - 1}"
      s"""pos_$r AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM $prev),
         |pc_$r AS (
         |  SELECT t[i] AS l, t[i+1] AS r, count(*) AS cnt
         |  FROM pos_$r WHERE i < len(t) GROUP BY 1, 2),
         |top_$r AS (
         |  SELECT l, r, CAST(cnt AS BIGINT) AS cnt
         |  FROM pc_$r ORDER BY cnt DESC, l, r LIMIT 1),
         |cand_$r AS (
         |  SELECT p.doc_id, p.i FROM pos_$r p, top_$r w
         |  WHERE p.i < len(p.t) AND p.t[p.i] = w.l AND p.t[p.i+1] = w.r),
         |isl_$r AS (
         |  SELECT doc_id, i,
         |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
         |  FROM cand_$r),
         |mrg_$r AS (
         |  SELECT doc_id, i FROM (
         |    SELECT doc_id, i,
         |      row_number() OVER (PARTITION BY doc_id, grp ORDER BY i) AS rn
         |    FROM isl_$r)
         |  WHERE rn % 2 = 1),
         |cur_$r AS (
         |  SELECT doc_id, list(tok ORDER BY pos) AS t FROM (
         |    SELECT m.doc_id, m.i AS pos, w.l || chr(1) || w.r AS tok
         |    FROM mrg_$r m, top_$r w
         |    UNION ALL
         |    SELECT p.doc_id, p.i AS pos, p.t[p.i] AS tok FROM pos_$r p
         |    WHERE NOT EXISTS (SELECT 1 FROM mrg_$r m
         |      WHERE m.doc_id = p.doc_id AND (m.i = p.i OR m.i = p.i - 1)))
         |  GROUP BY doc_id)""".stripMargin
    }.mkString(",\n")
  }

  /** The shared WITH block (tokenized corpus + k unrolled merge rounds)
    * both BPE oracles interpolate — one text, so q155 and q162 cannot
    * drift.
    */
  private def bpeRoundsWith(rounds: String): String =
    s"""WITH cur_0 AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |$rounds""".stripMargin

  /** q162's DuckDB twin: replay the k training rounds (the q155 CTE
    * machinery, same generated text), then derive the vocabulary (dense
    * 0-based ids by binary token order over the final token set —
    * exactly `Bpe.storeVocab`'s rule) and emit the encoded corpus flat
    * as (doc_id, pos, token_id). DuckDB's parallel unnest zips the
    * token list with its positions.
    */
  private def bpeEncodeOracleSql(k: Int): String = {
    val rounds = bpeRoundCtes(k)
    // fin is MATERIALIZED because BOTH vocab and enc read the final
    // token lists: DuckDB inlines plain CTEs, so referencing cur_k
    // twice evaluated the whole k-round replay twice — which blew the
    // local harness's memory at sf0.1 (round-13 soak catch)
    s"""${bpeRoundsWith(rounds)},
       |fin AS MATERIALIZED (SELECT doc_id, t FROM cur_$k),
       |vocab AS (
       |  SELECT tok, CAST(row_number() OVER (ORDER BY tok) - 1 AS BIGINT) AS id
       |  FROM (SELECT DISTINCT unnest(t) AS tok FROM fin)),
       |enc AS (
       |  SELECT doc_id, unnest(t) AS token,
       |    unnest(range(1, len(t) + 1)) AS pos
       |  FROM fin)
       |SELECT e.doc_id, CAST(e.pos AS BIGINT) AS pos, v.id AS token_id
       |FROM enc e JOIN vocab v ON v.tok = e.token
       |ORDER BY e.doc_id, e.pos""".stripMargin
  }

  /** Gopher-gated docs with RAW gate signals — q75's staged pipeline
    * extracted so q148's classifier labels come from the SAME expression
    * tree as the gate itself (single source of truth; the four threshold
    * constants above are already shared). Columns: doc_id, n_tokens,
    * __frac_stop (raw double), __dup_raw (raw double, NULL when no
    * bigrams), keep_flag (long 0/1, never NULL — see the three-valued
    * logic note in q75).
    */
  private def gopherFlagged(docs: DataFrame): DataFrame = {
    import graft.operators.TextAnalysis.bigramArray
    // staged projections (see q74): tokens, grams, and the filtered/
    // distinct counts each materialize exactly once
    val fracStop = col("__n_stop").cast("double") / col("n_tokens").cast("double")
    val dupFrac = when(col("__n2") > 0,
      col("__ndup").cast("double") / col("__n2").cast("double"))
    docs
      .select(col("doc_id"), split(col("text"), " ").as("__t"))
      .select(col("doc_id"), col("__t"), bigramArray(col("__t")).as("__g2"))
      .select(col("doc_id"),
        size(col("__t")).cast("long").as("n_tokens"),
        size(filter(col("__t"), t => t.isin(stopwords: _*))).cast("long").as("__n_stop"),
        size(col("__g2")).cast("long").as("__n2"),
        (size(col("__g2")) - size(array_distinct(col("__g2")))).cast("long").as("__ndup"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        fracStop.as("__frac_stop"),
        dupFrac.as("__dup_raw"),
        // NB three-valued logic: a single-token doc has NULL dup_frac,
        // but n_tokens<10 is already FALSE, and FALSE AND NULL = FALSE
        // in both engines, so keep_flag stays 0, never NULL
        (col("n_tokens").between(MinTok, MaxTok) && fracStop >= StopFloor &&
          dupFrac <= DupCeil)
          .cast("long").as("keep_flag"))
  }

  /** The q148 naive-Bayes pipeline, shared with q151's calibration
    * table: (doc_id, keep_flag, n_terms, score_micros, nb_keep). See
    * q148's scaladoc for the scale argument.
    *
    * The fit/score stages (model, totals, scoring join) all re-derived
    * the same (doc, tok, tf, keep_flag) training postings, so the
    * unshared tree re-scanned `documents` 7 times (r10 verdict #6; at
    * runtime Spark's exchange reuse already collapsed that to 3 actual
    * scans — the checkpoint makes the sharing EXPLICIT instead of an
    * AQE artifact). The postings are eagerly localCheckpointed ONCE;
    * model, totals, and the scoring join read the materialized blocks.
    * Exactly one checkpoint: also materializing the slim flags and the
    * vocabulary-sized model (or rerouting the prior through a postings
    * groupBy) was measured ~0.2–0.5 s SLOWER at sf0.1 — each eager
    * checkpoint is a job barrier, and re-aggregating from the postings
    * blocks is cheaper than parking the aggregates. The prior stays on
    * the gate path (one extra slim source scan, no postings shuffle).
    */
  private def nbScored(docs: DataFrame): DataFrame = {
    val flags = gopherFlagged(docs).select(col("doc_id"), col("keep_flag"))
    val tf = graft.operators.Par.fanOut(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val labeled = tf.join(flags, "doc_id").localCheckpoint(true)
    val model = labeled.groupBy(col("tok")).agg(
      sum(when(col("keep_flag") === 1, col("tf")).otherwise(0L)).as("pos_c"),
      sum(when(col("keep_flag") === 0, col("tf")).otherwise(0L)).as("neg_c"))
    val totals = model.agg(
      sum(col("pos_c")).as("pos_tot"),
      sum(col("neg_c")).as("neg_tot"),
      count(lit(1)).as("v_sz"))
    val prior = flags
      .agg(sum(col("keep_flag")).as("n_pos"),
        sum(lit(1L) - col("keep_flag")).as("n_neg"))
      .select(expr(nbPriorMicros).as("prior_micros"))
    labeled.join(model, "tok")
      .crossJoin(broadcast(totals))
      .withColumn("tok_micros", expr(nbTokenMicros))
      .groupBy(col("doc_id"), col("keep_flag"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("tf") * col("tok_micros")).as("__tok_sum"))
      .crossJoin(broadcast(prior))
      .select(col("doc_id"), col("keep_flag"), col("n_terms"),
        (col("prior_micros") + col("__tok_sum")).as("score_micros"),
        (col("prior_micros") + col("__tok_sum") > 0).cast("long").as("nb_keep"))
  }

  /** The q148 pipeline as shared DuckDB CTE text (through the per-doc
    * scored frame `sc2`), interpolated into both q148's and q151's
    * oracles so the two cannot drift.
    */
  private def nbCtes: String =
    s"""WITH st AS (
       |  SELECT doc_id,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
       |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS frac_stop,
       |    list_transform(range(greatest(len(string_split(text, ' ')) - 1, 0)),
       |      i -> string_split(text, ' ')[i+1] || '_' || string_split(text, ' ')[i+2]) AS g2
       |  FROM documents),
       |gd AS (
       |  SELECT doc_id, n_tokens, frac_stop,
       |    CASE WHEN len(g2) > 0 THEN
       |      CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE)
       |    END AS dup_raw
       |  FROM st),
       |g AS (
       |  SELECT doc_id,
       |    CAST(COALESCE(n_tokens BETWEEN $MinTok AND $MaxTok
       |      AND frac_stop >= $StopFloor
       |      AND dup_raw <= $DupCeil, FALSE) AS BIGINT) AS keep_flag
       |  FROM gd),
       |tf AS (
       |  SELECT doc_id, tok, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY doc_id, tok),
       |lab AS (SELECT tf.doc_id, tok, tf, keep_flag FROM tf JOIN g USING (doc_id)),
       |model AS (
       |  SELECT tok,
       |    CAST(sum(CASE WHEN keep_flag = 1 THEN tf ELSE 0 END) AS BIGINT) AS pos_c,
       |    CAST(sum(CASE WHEN keep_flag = 0 THEN tf ELSE 0 END) AS BIGINT) AS neg_c
       |  FROM lab GROUP BY tok),
       |tot AS (
       |  SELECT CAST(sum(pos_c) AS BIGINT) AS pos_tot,
       |    CAST(sum(neg_c) AS BIGINT) AS neg_tot,
       |    count(*) AS v_sz FROM model),
       |pr AS (
       |  SELECT CAST(sum(keep_flag) AS BIGINT) AS n_pos,
       |    CAST(sum(1 - keep_flag) AS BIGINT) AS n_neg FROM g),
       |prm AS (SELECT $nbPriorMicros AS prior_micros FROM pr),
       |sc AS (
       |  SELECT lab.doc_id, lab.keep_flag, lab.tf, $nbTokenMicros AS tok_micros
       |  FROM lab JOIN model USING (tok) CROSS JOIN tot),
       |sc2 AS (
       |  SELECT sc.doc_id, sc.keep_flag, CAST(count(*) AS BIGINT) AS n_terms,
       |    CAST(prior_micros + sum(tf * tok_micros) AS BIGINT) AS score_micros
       |  FROM sc CROSS JOIN prm
       |  GROUP BY sc.doc_id, sc.keep_flag, prior_micros)""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      "q24_docs_dedup_exact",
      (s, d) =>
        documents(s, d)
          .groupBy(col("text"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .select(col("keep_id"), col("n_copies"), col("text"))
          .orderBy(col("keep_id")),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies, text
             |FROM documents
             |GROUP BY text
             |ORDER BY keep_id""".stripMargin),
      "exact dedup: keep lowest doc_id per identical text (hash-groupBy on text)"),

    Q(
      "q25_docs_token_stats",
      (s, d) =>
        documents(s, d)
          .select(
            col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            size(array_distinct(toks)).cast("long").as("n_uniq_tokens"),
            length(col("text")).cast("long").as("n_chars_actual"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
             |  length(text) AS n_chars_actual
             |FROM documents
             |ORDER BY doc_id""".stripMargin),
      "token counting: whitespace tokenizer + distinct vocabulary per doc"),

    Q(
      "q26_docs_lang_profile",
      (s, d) =>
        documents(s, d)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            round(avg(col("n_chars")), 2).as("avg_chars"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy(col("lang")),
      Some("""SELECT lang, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM documents
             |GROUP BY lang
             |ORDER BY lang""".stripMargin),
      "corpus profile per language tag"),

    Q(
      "q61_tfidf_top_terms",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = documents(s, d)
        val tf = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        // df_ is vocabulary-sized — unhinted join (AQE decides); the corpus
        // size for idf is a 1-row agg cross-joined in (always broadcastable,
        // no driver-side count() action per invocation).
        val df_ = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tf").desc, col("df").asc, col("token"))
        tf.join(df_, "token")
          .crossJoin(broadcast(nDocs))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"),
            round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
             |tfc AS (SELECT doc_id, token, count(*) AS tf FROM tf GROUP BY doc_id, token),
             |dfc AS (SELECT token, count(*) AS df FROM tfc GROUP BY token),
             |n AS (SELECT count(*) AS n FROM documents),
             |ranked AS (
             |  SELECT doc_id, token, tf, df,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY tf DESC, df ASC, token) AS rank
             |  FROM tfc JOIN dfc USING (token))
             |SELECT doc_id, rank, token, tf, df,
             |  round(tf * ln(CAST((SELECT n FROM n) AS DOUBLE) / df), 6) AS tfidf
             |FROM ranked
             |WHERE rank <= 3
             |ORDER BY doc_id, rank""".stripMargin),
      "TF-IDF top-3 terms per doc; ranking on integer keys (tf,df,token) so cross-engine float ulps can't reorder"),

    Q(
      "q27_docs_quality",
      (s, d) => {
        val nTok  = size(toks).cast("long")
        val nLong = size(filter(toks, t => length(t) > 5)).cast("long")
        val nStop = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
        documents(s, d)
          .select(
            col("doc_id"),
            nTok.as("n_tokens"),
            round(nLong.cast("double") / nTok.cast("double"), 4).as("frac_long"),
            round(nStop.cast("double") / nTok.cast("double"), 4).as("frac_stop"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |  len(string_split(text, ' ')) AS n_tokens,
              |  round(CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 5)) AS DOUBLE)
              |    / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS frac_long,
              |  round(CAST(len(list_filter(string_split(text, ' '), x -> x IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) AS DOUBLE)
              |    / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS frac_stop
              |FROM documents
              |ORDER BY doc_id""".stripMargin),
      "quality scoring: long-word and stopword ratios via array higher-order fns"),

    Q(
      "q72_docs_pii_scrub",
      (s, d) => {
        import graft.operators.TextAnalysis._
        // The corpus has no PII, so the fixture injects it deterministically
        // (same expression on both sides) — the operator under test is the
        // scrubber, and the oracle proves redaction parity byte-for-byte.
        val piiInput = concat(col("text"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(11)) === 0,
            concat(lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".1")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(13)) === 0,
            concat(lit(" call +"), (col("doc_id") + 14155550000L).cast("string")))
            .otherwise(lit("")))
        documents(s, d)
          .select(col("doc_id"), piiInput.as("raw"))
          .select(
            col("doc_id"),
            piiCount(col("raw"), emailRe).as("n_emails"),
            piiCount(col("raw"), ipRe).as("n_ips"),
            piiCount(col("raw"), phoneRe).as("n_phones"),
            scrubPii(col("raw")).as("scrubbed"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH raw AS (
              |  SELECT doc_id, text
              |    || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
              |    || CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' ELSE '' END
              |    || CASE WHEN doc_id % 13 = 0 THEN ' call +' || CAST(doc_id + 14155550000 AS VARCHAR) ELSE '' END AS raw
              |  FROM documents)
              |SELECT doc_id,
              |  len(regexp_extract_all(raw, '${graft.operators.TextAnalysis.emailRe}')) AS n_emails,
              |  len(regexp_extract_all(raw, '${graft.operators.TextAnalysis.ipRe}')) AS n_ips,
              |  len(regexp_extract_all(raw, '${graft.operators.TextAnalysis.phoneRe}')) AS n_phones,
              |  regexp_replace(regexp_replace(regexp_replace(raw,
              |    '${graft.operators.TextAnalysis.emailRe}', '[EMAIL]', 'g'),
              |    '${graft.operators.TextAnalysis.ipRe}', '[IP]', 'g'),
              |    '${graft.operators.TextAnalysis.phoneRe}', '[PHONE]', 'g') AS scrubbed
              |FROM raw
              |ORDER BY doc_id""".stripMargin),
      "PII scrub: email/IP/phone redaction with match counts (backslash-free regexes shared across engines)"),

    Q(
      "q73_docs_train_split",
      (s, d) => {
        // Multiplicative-congruential bucket: deterministic, engine-portable
        // arithmetic (no xxhash64), uniform across contiguous ids. NB the
        // product stays in int64 for doc_id < ~3.4e9; beyond that use the
        // xxhash64 variant (rows-only) — DuckDB would error on overflow
        // rather than silently diverge.
        val bucket = pmod(col("doc_id") * lit(2654435761L), lit(100)).cast("long")
        documents(s, d)
          .select(col("doc_id"), bucket.as("bucket"))
          .withColumn("split",
            when(col("bucket") < 90, "train")
              .when(col("bucket") < 95, "val")
              .otherwise("test"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  (doc_id * 2654435761) % 100 AS bucket,
             |  CASE WHEN (doc_id * 2654435761) % 100 < 90 THEN 'train'
             |       WHEN (doc_id * 2654435761) % 100 < 95 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM documents
             |ORDER BY doc_id""".stripMargin),
      "deterministic train/val/test assignment (90/5/5) via multiplicative hash bucket"),

    Q(
      "q74_docs_repetition",
      (s, d) => {
        import graft.operators.TextAnalysis.bigramArray
        // staged projections: the token array, the grams array, and the
        // distinct-size are non-cheap expressions — materialize each ONCE,
        // then derive the scalars. The TOKEN stage matters most: an inline
        // split re-tokenizes the text inside every element_at of
        // bigramArray's lambda (lambda-interior references defeat runtime
        // CSE — O(len²)/doc, measured 6x on q74 at sf0.1; q75 had it
        // staged already, hence its r6 bench gap to q74 on shared work)
        documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("__t"))
          .select(col("doc_id"), bigramArray(col("__t")).as("__g2"))
          .select(col("doc_id"),
            size(col("__g2")).cast("long").as("n_2grams"),
            (size(col("__g2")) - size(array_distinct(col("__g2")))).cast("long")
              .as("n_dup_2grams"))
          .select(col("doc_id"), col("n_2grams"), col("n_dup_2grams"),
            when(col("n_2grams") > 0,
              round(col("n_dup_2grams").cast("double") / col("n_2grams").cast("double"), 4))
              .as("dup_frac"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |g AS (SELECT doc_id,
             |        list_transform(range(greatest(len(t) - 1, 0)),
             |          i -> t[i+1] || '_' || t[i+2]) AS g2
             |      FROM t)
             |SELECT doc_id,
             |  len(g2) AS n_2grams,
             |  len(g2) - len(list_distinct(g2)) AS n_dup_2grams,
             |  CASE WHEN len(g2) > 0 THEN
             |    round(CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
             |      / CAST(len(g2) AS DOUBLE), 4) END AS dup_frac
             |FROM g
             |ORDER BY doc_id""".stripMargin),
      "repetition/boilerplate signal: duplicate word-bigram fraction per doc (C4/Gopher-style)"),

    Q(
      "q75_docs_quality_filter",
      (s, d) =>
        // staged gate pipeline shared with q148's classifier labels
        // (see [[gopherFlagged]])
        gopherFlagged(documents(s, d))
          .select(
            col("doc_id"),
            col("n_tokens"),
            round(col("__frac_stop"), 4).as("frac_stop"),
            round(col("__dup_raw"), 4).as("dup_frac"),
            col("keep_flag"))
          .orderBy(col("doc_id")),
      Some(s"""WITH s AS (
             |  SELECT doc_id,
             |    len(string_split(text, ' ')) AS n_tokens,
             |    CAST(len(list_filter(string_split(text, ' '),
             |      x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
             |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS frac_stop,
             |    list_transform(range(greatest(len(string_split(text, ' ')) - 1, 0)),
             |      i -> string_split(text, ' ')[i+1] || '_' || string_split(text, ' ')[i+2]) AS g2
             |  FROM documents),
             |d AS (
             |  SELECT doc_id, n_tokens, frac_stop,
             |    CASE WHEN len(g2) > 0 THEN
             |      CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE)
             |    END AS dup_raw
             |  FROM s)
             |SELECT doc_id, n_tokens,
             |  round(frac_stop, 4) AS frac_stop,
             |  round(dup_raw, 4) AS dup_frac,
             |  CAST(COALESCE(n_tokens BETWEEN $MinTok AND $MaxTok
             |    AND frac_stop >= $StopFloor
             |    AND dup_raw <= $DupCeil, FALSE) AS BIGINT) AS keep_flag
             |FROM d
             |ORDER BY doc_id""".stripMargin),
      "Gopher-style composite quality gate: token-count bounds + stopword floor + repetition ceiling"),

    Q(
      "q105_docs_unigram_freq",
      (s, d) => {
        // Corpus-level unigram-frequency scoring — the integer-exact
        // analog of the CCNet language-model filter: build the corpus
        // vocabulary with global token counts, then score each document
        // by how common/rare its tokens are (sum / min / max of corpus
        // frequency plus the per-doc distinct count). A log-prob variant
        // would hinge on libm ln() bit-parity across engines (not
        // guaranteed); frequency statistics carry the same "gibberish vs
        // stopword soup" signal and hash-match exactly.
        // SCALE: one explode, one token-key shuffle for the vocab, one
        // token-key shuffle joining occurrences back, one doc_id agg. At
        // 100 TB the vocab above a small df floor is broadcast-sized
        // (Zipf tail is singletons), turning the join into a broadcast;
        // the plain shuffle join here is the general shape.
        val toksOf = graft.operators.Par.fanOut(documents(s, d))
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val vocab = toksOf.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        toksOf.join(vocab, Seq("tok"))
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_toks"),
            countDistinct(col("tok")).as("n_uniq"),
            sum(col("freq")).cast("long").as("sum_freq"),
            min(col("freq")).as("min_freq"),
            max(col("freq")).as("max_freq"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |v AS (
             |  SELECT tok, count(*) AS freq FROM t GROUP BY tok)
             |SELECT t.doc_id,
             |  count(*) AS n_toks,
             |  count(DISTINCT t.tok) AS n_uniq,
             |  CAST(sum(v.freq) AS BIGINT) AS sum_freq,
             |  min(v.freq) AS min_freq,
             |  max(v.freq) AS max_freq
             |FROM t JOIN v USING (tok)
             |GROUP BY t.doc_id
             |ORDER BY t.doc_id""".stripMargin),
      "corpus unigram-frequency scoring (integer-exact LM-filter analog): per-doc sum/min/max corpus token frequency"),

    Q(
      "q106_source_overlap",
      (s, d) => {
        // Cross-source duplication matrix: how many distinct word
        // 8-grams each PAIR of sources shares. Exact text never repeats
        // across sources in this corpus (q24), so the overlap signal
        // lives at the shingle level — the same index q83 builds, but
        // keyed by source and self-joined to rank source pairs for
        // crawl/source weighting (feeds the q80/q81 curation levers).
        // SCALE: distinct (source, shingle) is one map-side-combined
        // shuffle; the self-join shuffles on the shingle. At 100 TB the
        // join key is xxhash64(shingle) (8 bytes, Dedup.shingleIndex's
        // key) and hot boilerplate shingles get a df-cap like q30's —
        // strings kept here so DuckDB can replay exactly.
        val n = 8
        val base = documents(s, d).select(col("source"), split(col("text"), " ").as("t"))
        val sh = graft.operators.Par.fanOut(base)
          .select(col("source"), col("t"),
            explode(when(size(col("t")) >= n, sequence(lit(1), size(col("t")) - (n - 1)))
              .otherwise(array().cast("array<int>"))).as("i"))
          .select(col("source"),
            concat_ws(" ", slice(col("t"), col("i"), lit(n))).as("sh"))
          .distinct()
        sh.as("a").join(sh.as("b"),
            col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
          .agg(count(lit(1)).as("n_shared"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some("""WITH tok AS (
             |  SELECT source, string_split(text, ' ') AS t FROM documents),
             |sh AS (
             |  SELECT DISTINCT source, sh FROM (
             |    SELECT source,
             |      unnest(list_transform(range(1, len(t) - 6),
             |        i -> array_to_string(t[i:i+7], ' '))) AS sh
             |    FROM tok WHERE len(t) >= 8))
             |SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
             |FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
             |GROUP BY source_a, source_b
             |ORDER BY source_a, source_b""".stripMargin),
      "cross-source duplication matrix: distinct shared word-8-grams per source pair (source-weighting signal)"),

    Q(
      "q110_bpe_pair_counts",
      (s, d) => {
        // The BPE-training inner loop: corpus-wide counts of ADJACENT
        // token pairs, top-100 by count (the merge-candidate ranking each
        // BPE iteration consumes). Pure integers + binary-collated
        // strings — hash-exact across engines; the (cnt DESC, l, r)
        // order is total, so the LIMIT cut is deterministic in both.
        // SCALE: explode is linear in token count (start offsets only,
        // the q83/q98 Generate discipline — the token array is projected
        // once, never recomputed per output row); the only shuffle is the
        // map-side-combined (l, r) count; top-100 is TakeOrderedAndProject
        // (per-partition heaps + a 100-row driver merge), never a global
        // sort. One BPE merge round at 100 TB is exactly this job.
        val base = graft.operators.Par.fanOut(documents(s, d))
          .select(split(col("text"), " ").as("t"))
          .where(size(col("t")) >= 2)
        base
          .select(col("t"), explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
          .select(
            element_at(col("t"), col("i")).as("l"),
            element_at(col("t"), col("i") + 1).as("r"))
          .groupBy(col("l"), col("r"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(100)
      },
      Some("""WITH tok AS (
             |  SELECT string_split(text, ' ') AS t FROM documents),
             |idx AS (
             |  SELECT t, unnest(range(1, len(t))) AS i
             |  FROM tok WHERE len(t) >= 2),
             |pairs AS (
             |  SELECT t[i] AS l, t[i + 1] AS r FROM idx)
             |SELECT l, r, count(*) AS cnt
             |FROM pairs
             |GROUP BY l, r
             |ORDER BY cnt DESC, l, r
             |LIMIT 100""".stripMargin),
      "BPE-training inner loop: corpus-wide adjacent token-pair counts, top-100 merge candidates (deterministic total order)"),

    Q(
      "q155_bpe_train",
      (s, d) =>
        // The ITERATIVE BPE trainer (r10 verdict #5) — q110 is one round
        // of this loop: count adjacent pairs, take the (cnt DESC, l, r)
        // winner, apply the merge greedily left-to-right, recount; 3
        // rounds here. Per round the distributed work is one map-side-
        // combined pair count + TakeOrdered(1) and one merge projection;
        // the corpus re-tokenization localCheckpoints between rounds
        // (components' iterative-lineage discipline) and the winner is a
        // 1-row scalar read. The DuckDB twin replays all 3 rounds with
        // the greedy rule rewritten as gaps-and-islands parity (within a
        // run of overlapping candidates the 1st, 3rd, 5th … merge) —
        // provably the same pick set, pinned equal by BpeSpec's fold-vs-
        // recount properties and this oracle's tri-scale hash match.
        graft.operators.Bpe.train(documents(s, d), rounds = 3)
          .orderBy(col("round")),
      Some(bpeTrainOracleSql(3)),
      "iterative BPE trainer: 3 merge rounds (count pairs, take total-order winner, greedy left-to-right apply, recount) — per round one pair-count aggregate + one merge projection, checkpointed between rounds; oracle replays the loop via gaps-and-islands parity"),

    Q(
      "q162_bpe_encode",
      (s, d) =>
        // The ENCODE half of the tokenizer (r12 verdict #4) — what a
        // training pipeline actually runs nightly: apply the STORED
        // vocabulary (q155's merges + derived (token, id) table, built
        // once per session into the artifact memo) to the corpus,
        // producing token ids. Flat (doc_id, pos, token_id) shape: the
        // merge application is the same zero-shuffle per-row fold as
        // training, the id mapping is a broadcast join against the
        // vocab artifact — the corpus never shuffles at all in this
        // plan. BpeSpec pins the decode(encode(x)) == x round-trip on
        // the array form; the oracle replays training + vocab + encode
        // from scratch in DuckDB (gaps-and-islands parity again).
        graft.operators.Bpe.encodeStoredFlat(s, documents(s, d), bpeVocabPath(s, d))
          .orderBy(col("doc_id"), col("pos")),
      Some(bpeEncodeOracleSql(3)),
      "BPE vocab APPLY (the encode half of the tokenizer): corpus -> token ids against the stored merge+vocab artifact — zero-shuffle merge fold + broadcast vocab join; round-trip decode property in BpeSpec; oracle replays train+encode"),

    Q(
      "q115_vocab_coverage",
      (s, d) => {
        // Vocabulary coverage / OOV-rate scoring: fix a top-k corpus
        // vocabulary (count DESC, token ASC — a deterministic total
        // order, so the LIMIT cut is identical in both engines), then
        // score every document by how much of it falls outside that
        // vocabulary. The per-doc OOV rate is THE gating signal for
        // tokenizer/vocab sizing, and a high rate flags gibberish the
        // q75-style gates miss. Integer permille, never a float ratio.
        // k=16 against this synthetic corpus's 31-token vocabulary keeps
        // both sides of the cut populated (a real run uses 32k–256k —
        // k shifts the broadcast size, never the plan shape).
        // SCALE: vocab is top-k over a map-side-combined token count
        // (TakeOrderedAndProject), then broadcast — the probe side never
        // shuffles for the join; the only probe-side shuffle is the
        // final doc_id agg. Vocab size is a constant, not data-scaled.
        val toks = graft.operators.Par.fanOut(documents(s, d))
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok")).limit(16)
          .select(col("tok"), lit(1L).as("in_vocab"))
        toks.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_toks"),
            sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
          .withColumn("oov_permille", expr("(n_oov * 1000) DIV n_toks"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |v AS (
             |  SELECT tok, 1 AS in_vocab FROM (
             |    SELECT tok, count(*) AS cnt FROM t GROUP BY tok
             |    ORDER BY cnt DESC, tok LIMIT 16))
             |SELECT t.doc_id,
             |  count(*) AS n_toks,
             |  CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_oov,
             |  (CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) * 1000) // count(*) AS oov_permille
             |FROM t LEFT JOIN v USING (tok)
             |GROUP BY t.doc_id
             |ORDER BY t.doc_id""".stripMargin),
      "vocabulary coverage / OOV-rate scoring: per-doc out-of-vocabulary tokens against a deterministic top-k corpus vocab (integer permille)"),

    Q(
      "q129_curation_funnel",
      (s, d) => {
        import graft.operators.TextAnalysis.bigramArray
        // Pipeline observability: the survival funnel through the
        // curation ladder — raw → token bounds → +stopword floor →
        // +repetition ceiling (the conjunction is exactly q75's
        // keep_flag; CurationSpec pins that identity) → +exact-dedup
        // winner. One scan computes every per-doc flag; the only extra
        // shuffle is the dedup-winner stage keyed on text (at 100 TB:
        // xxhash64(text) with equality re-check — q124's documented key
        // swap); the output is one 5-counter row via a single
        // conditional-sum aggregate (the A2 shape at corpus level). The
        // funnel is monotone by construction — a report where a later
        // stage exceeds an earlier one is structurally impossible, not
        // just untested.
        val base = documents(s, d)
          .select(col("doc_id"), col("text"), split(col("text"), " ").as("__t"))
          .select(col("doc_id"), col("text"), col("__t"),
            bigramArray(col("__t")).as("__g2"))
          .select(col("doc_id"), col("text"),
            size(col("__t")).cast("long").as("__n"),
            size(filter(col("__t"), t => t.isin(stopwords: _*))).cast("long")
              .as("__nstop"),
            size(col("__g2")).cast("long").as("__n2"),
            (size(col("__g2")) - size(array_distinct(col("__g2")))).cast("long")
              .as("__ndup"))
        val winners = base.groupBy(col("text")).agg(min(col("doc_id")).as("__w"))
        base.join(winners, "text")
          .select(
            col("__n").between(MinTok, MaxTok).as("s1"),
            (col("__nstop").cast("double") / col("__n").cast("double") >= StopFloor)
              .as("s2"),
            (when(col("__n2") > 0,
              col("__ndup").cast("double") / col("__n2").cast("double")) <= DupCeil)
              .as("s3"),
            (col("doc_id") === col("__w")).as("s4"))
          .agg(
            count(lit(1)).as("n_raw"),
            sum(when(col("s1"), 1L).otherwise(0L)).as("n_len_ok"),
            sum(when(col("s1") && col("s2"), 1L).otherwise(0L)).as("n_stop_ok"),
            sum(when(col("s1") && col("s2") && col("s3"), 1L).otherwise(0L))
              .as("n_rep_ok"),
            sum(when(col("s1") && col("s2") && col("s3") && col("s4"), 1L)
              .otherwise(0L)).as("n_final"))
      },
      Some(s"""WITH s AS (
             |  SELECT doc_id, text,
             |    len(string_split(text, ' ')) AS n_tokens,
             |    CAST(len(list_filter(string_split(text, ' '),
             |      x -> x IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) AS DOUBLE)
             |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS frac_stop,
             |    list_transform(range(greatest(len(string_split(text, ' ')) - 1, 0)),
             |      i -> string_split(text, ' ')[i+1] || '_' || string_split(text, ' ')[i+2]) AS g2
             |  FROM documents),
             |d AS (
             |  SELECT doc_id, text, n_tokens, frac_stop,
             |    CASE WHEN len(g2) > 0 THEN
             |      CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE)
             |    END AS dup_raw
             |  FROM s),
             |w AS (SELECT text, min(doc_id) AS w FROM documents GROUP BY text),
             |f AS (
             |  SELECT d.doc_id,
             |    d.n_tokens BETWEEN $MinTok AND $MaxTok AS s1,
             |    d.frac_stop >= $StopFloor AS s2,
             |    d.dup_raw <= $DupCeil AS s3,
             |    d.doc_id = w.w AS s4
             |  FROM d JOIN w ON w.text = d.text)
             |SELECT count(*) AS n_raw,
             |  CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
             |  CAST(sum(CASE WHEN s1 AND s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_stop_ok,
             |  CAST(sum(CASE WHEN s1 AND s2 AND s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_ok,
             |  CAST(sum(CASE WHEN s1 AND s2 AND s3 AND s4 THEN 1 ELSE 0 END) AS BIGINT) AS n_final
             |FROM f""".stripMargin),
      "curation-funnel observability: one-pass staged survival counts (raw -> token bounds -> +stopword floor -> +repetition ceiling [= q75's gate] -> +exact-dedup winner), monotone by construction"),

    Q(
      "q131_bm25_topk",
      (s, d) => {
        // BM25 lexical retrieval (Robertson/Spärck Jones; the Lucene
        // idf = ln(1 + (N-df+0.5)/(df+0.5)) variant, k1=1.2, b=0.75):
        // top-20 docs for a fixed query-term set — the keyword-search
        // complement of the ANN operators (q37/q63/q122). SCALE: the
        // postings frame is filtered to the query terms BEFORE its
        // (doc_id, token) agg, so the shuffle carries only matching
        // postings — at 100 TB that is |terms| inverted-index slices,
        // not the corpus; df is a |terms|-row agg (AQE broadcasts it);
        // corpus stats (N, total length) are a 1-row cross-joined agg;
        // doc length joins back on the high-cardinality doc_id; final
        // ranking is a TakeOrderedAndProject top-k, no global sort.
        // DETERMINISM: per-(doc,term) contribution is ONE shared
        // double expression ([[bm25Micros]], identical IEEE tree in
        // both engines — every integer column cast before float math,
        // the q130 rate_ppm discipline) floored to int64 micros; the
        // per-doc score is then an order-independent integer sum, and
        // the top-20 cut ties-breaks on doc_id over integer scores.
        val docs = documents(s, d)
        val dl = docs.select(col("doc_id"), size(toks).cast("long").as("dl"))
        val st = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
        val tf = docs
          .select(col("doc_id"), explode(toks).as("token"))
          .filter(col("token").isin(bm25Terms: _*))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        tf.join(dfc, "token")
          .join(dl, "doc_id")
          .crossJoin(broadcast(st))
          .withColumn("c_micros", expr(bm25Micros))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_hit"), sum(col("c_micros")).as("score_micros"))
          .orderBy(col("score_micros").desc, col("doc_id"))
          .limit(20)
          .select(col("doc_id"), col("n_hit"), col("score_micros"))
      },
      Some(bm25OracleSql()),
      "BM25 top-20 lexical retrieval (k1=1.2, b=0.75, Lucene idf) for a fixed query-term set — term-filtered postings agg, broadcast corpus stats, integer-micros scores summed order-independently; the keyword complement of the ANN operators"),

    Q(
      "q133_bigram_lm_score",
      (s, d) => {
        // CCNet-style LM scoring (Wenzek et al. 2020 filter corpora by
        // reference-LM perplexity; public paper): per-doc log-probability
        // under a Laplace-smoothed bigram model fitted on the lang='en'
        // slice — p(w2|w1) = (c12+1)/(c1+V). Low (very negative) scores
        // per bigram = text unlike the reference slice; the
        // perplexity-filter signal without an external model artifact.
        // SCALE: the model is two data-proportional count aggregates
        // (bigram and left-word) joined back UNHINTED on their
        // high-cardinality string keys — parallel shuffle joins that grow
        // with the vocabulary, never a broadcast of a data-sized frame
        // (at 100 TB, swap the join key for xxhash64(b) with equality
        // re-check, q124's documented key swap, and prune the model to a
        // top-V' cut). V is a 1-row distinct-vocab agg, cross-joined
        // broadcast. Each distinct (doc, bigram) scores ONCE and
        // multiplies its floored int64-micros contribution by the exact
        // in-doc count, so per-doc totals are order-independent integer
        // sums ([[bigramLmMicros]] is the one shared IEEE tree). Docs
        // with <2 tokens have no bigrams and drop out by construction.
        val docs = documents(s, d)
        val bgs = docs
          // token array staged before bigramArray (the q74 rule: an inline
          // split re-evaluates per lambda-interior element_at, O(len²)/doc)
          .select(col("doc_id"), col("lang"), split(col("text"), " ").as("__t"))
          .select(col("doc_id"), col("lang"),
            explode(graft.operators.TextAnalysis.bigramArray(col("__t"))).as("b"))
          .withColumn("w1", element_at(split(col("b"), "_"), 1))
        val en = bgs.filter(col("lang") === "en")
        val c12 = en.groupBy(col("b")).agg(count(lit(1)).as("c12"))
        val c1 = en.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        val vocab = docs.filter(col("lang") === "en")
          .select(explode(split(col("text"), " ")).as("token"))
          .agg(countDistinct(col("token")).as("v_sz"))
        val dbg = bgs.groupBy(col("doc_id"), col("b"), col("w1"))
          .agg(count(lit(1)).as("k"))
        dbg.join(c12, Seq("b"), "left")
          .join(c1, Seq("w1"), "left")
          .crossJoin(broadcast(vocab))
          .withColumn("contrib", expr(bigramLmMicros) * col("k"))
          .groupBy(col("doc_id"))
          .agg(sum(col("k")).as("n_bigrams"), sum(col("contrib")).as("logp_micros"))
          .select(col("doc_id"), col("n_bigrams"), col("logp_micros"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
             |bg AS (
             |  SELECT doc_id, lang,
             |    unnest(list_transform(range(greatest(len(w) - 1, 0)),
             |      i -> w[i+1] || '_' || w[i+2])) AS b
             |  FROM t),
             |bgw AS (SELECT doc_id, lang, b, string_split(b, '_')[1] AS w1 FROM bg),
             |c12 AS (SELECT b, count(*) AS c12 FROM bgw WHERE lang = 'en' GROUP BY b),
             |c1 AS (SELECT w1, count(*) AS c1 FROM bgw WHERE lang = 'en' GROUP BY w1),
             |v AS (
             |  SELECT count(DISTINCT token) AS v_sz FROM (
             |    SELECT unnest(string_split(text, ' ')) AS token
             |    FROM documents WHERE lang = 'en')),
             |dbg AS (
             |  SELECT doc_id, b, w1, count(*) AS k FROM bgw GROUP BY doc_id, b, w1),
             |sc AS (
             |  SELECT dbg.doc_id, dbg.k, $bigramLmMicros * dbg.k AS contrib
             |  FROM dbg LEFT JOIN c12 USING (b) LEFT JOIN c1 USING (w1) CROSS JOIN v)
             |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
             |  CAST(sum(contrib) AS BIGINT) AS logp_micros
             |FROM sc GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin),
      "CCNet-style bigram-LM log-prob score: Laplace p(w2|w1)=(c12+1)/(c1+V) fitted on the en slice, per-doc integer-micros sums — data-proportional model aggs joined back on high-cardinality keys, 1-row vocab broadcast; the perplexity-filter signal"),

    Q(
      "q135_char_entropy",
      (s, d) => {
        // Character-entropy quality score (gibberish / low-diversity text
        // detector — keyboard-mash and template spam sit at the entropy
        // extremes where stopword/length gates are blind). Per-doc Shannon
        // entropy over the character distribution, canonicalized as an
        // order-independent sum of per-distinct-char floored int64 micros
        // ([[charEntropyMicros]], one shared IEEE tree — the q131
        // discipline). SCALE: entirely per-row — chars, distinct chars,
        // and the per-char counts are staged array projections (the q74
        // lambda rule: each non-cheap array is materialized ONCE, never
        // recomputed inside a later lambda), so the plan is a zero-shuffle
        // codegen'd scan; no explode, no per-char shuffle rows, and the
        // alphabet bound (|distinct chars| << doc length) caps the
        // per-row work.
        // Counts come from the native codegen'd char_counts expression
        // (one primitive code-point pass + sort + run-length per row —
        // graft.functions.CharCounts, the §2.8 surface). The naive
        // distinct×filter HOF chain measured 4.8 s at sf0.1 and a pure-HOF
        // sorted-run-length rewrite 2.0 s; counts are identical in every
        // formulation, so the oracle's explode/groupBy arithmetic is
        // untouched.
        documents(s, d)
          .select(col("doc_id"),
            graft.operators.TextAnalysis.charCounts(col("text")).as("__cnt"))
          .select(col("doc_id"), col("__cnt"),
            expr("aggregate(__cnt, CAST(0 AS BIGINT), (a, c) -> a + c)")
              .as("n_ch"),
            size(col("__cnt")).cast("long").as("n_distinct_ch"))
          .select(col("doc_id"), col("n_ch"), col("n_distinct_ch"),
            expr(s"""aggregate(__cnt, CAST(0 AS BIGINT),
                    |  (acc, c) -> acc + $charEntropyMicros)""".stripMargin)
              .as("entropy_micros"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ch AS (
             |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
             |cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
             |nn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ch
             |       FROM cc GROUP BY doc_id)
             |SELECT cc.doc_id,
             |  CAST(max(nn.n_ch) AS BIGINT) AS n_ch,
             |  CAST(count(*) AS BIGINT) AS n_distinct_ch,
             |  CAST(sum($charEntropyMicros) AS BIGINT) AS entropy_micros
             |FROM cc JOIN nn ON nn.doc_id = cc.doc_id
             |GROUP BY cc.doc_id
             |ORDER BY cc.doc_id""".stripMargin),
      "per-doc character Shannon entropy in integer micros (gibberish/template-spam quality signal) — zero-shuffle per-row plan over the native char_counts histogram expression, order-independent integer sum"),

    Q(
      "q137_dup_ngram_fraction",
      (s, d) => {
        // Per-doc duplicated-n-gram fraction (the RefinedWeb/Dolma-report
        // quality axis): what share of a doc's distinct word-8-grams also
        // appear in at least one OTHER document. High values mark
        // boilerplate/template text that survives exact and near-dup
        // dedup (the doc as a whole is unique; its content is not).
        // SCALE: q106's shape — the distinct (doc_id, 8-gram) index is
        // one map-side-combined shuffle, document frequency is an
        // aggregate on the gram key, and the join back is gram-keyed
        // (high-cardinality, AQE-managed). Strings kept as keys so DuckDB
        // replays exactly; at 100 TB the key is xxhash64(gram) (8 bytes,
        // Dedup.shingleIndex's discipline) with a q30-style df-cap on
        // boilerplate grams. Docs under 8 tokens have no 8-grams and drop
        // out by construction. Integer permille, floor division (q115).
        val n = 8
        val base = documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
        val sh = graft.operators.Par.fanOut(base)
          .select(col("doc_id"), col("t"),
            explode(when(size(col("t")) >= n, sequence(lit(1), size(col("t")) - (n - 1)))
              .otherwise(array().cast("array<int>"))).as("i"))
          .select(col("doc_id"),
            concat_ws(" ", slice(col("t"), col("i"), lit(n))).as("sh"))
          .distinct()
        val dfc = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        sh.join(dfc, "sh")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
          .withColumn("dup_permille", expr("n_dup_grams * 1000 DIV n_grams"))
          .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
            col("dup_permille"))
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
             |dfc AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
             |SELECT s.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_grams,
             |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_dup_grams,
             |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000 // count(*)
             |    AS BIGINT) AS dup_permille
             |FROM sh s JOIN dfc USING (sh)
             |GROUP BY s.doc_id
             |ORDER BY s.doc_id""".stripMargin),
      "per-doc duplicated-8-gram fraction (RefinedWeb/Dolma boilerplate axis): share of a doc's distinct 8-grams appearing in other docs, integer permille — distinct-index shuffle + gram-keyed df join-back, q106's scale shape"),

    Q(
      "q140_source_quality_report",
      (s, d) => {
        // Per-source curation dashboard: doc counts, token mass, and mean
        // character entropy by source — the table that decides which
        // source gets a q81 cap or a q130 temperature before anyone
        // looks at individual documents. Averages are floor divisions of
        // int64 sums (order-independent, engine-portable); entropy rides
        // the native char_counts histogram, so the per-doc stage is the
        // q135 zero-shuffle shape and the only exchange is the final
        // source-keyed aggregate.
        documents(s, d)
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tok"),
            graft.operators.TextAnalysis.charCounts(col("text")).as("__cnt"))
          .select(col("source"), col("n_tok"),
            expr("aggregate(__cnt, CAST(0 AS BIGINT), (a, c) -> a + c)")
              .as("n_ch"),
            col("__cnt"))
          .select(col("source"), col("n_tok"),
            expr(s"""aggregate(__cnt, CAST(0 AS BIGINT),
                    |  (acc, c) -> acc + $charEntropyMicros)""".stripMargin)
              .as("ent_micros"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("tot_tok"),
            sum(col("ent_micros")).as("__sum_ent"))
          .select(col("source"), col("n_docs"), col("tot_tok"),
            expr("tot_tok DIV n_docs").as("avg_tok"),
            expr("__sum_ent DIV n_docs").as("avg_entropy_micros"))
          .orderBy(col("source"))
      },
      Some(s"""WITH ch AS (
             |  SELECT doc_id, source, unnest(string_split(text, '')) AS ch
             |  FROM documents),
             |cc AS (SELECT doc_id, source, ch, count(*) AS c
             |       FROM ch GROUP BY doc_id, source, ch),
             |nn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ch
             |       FROM cc GROUP BY doc_id),
             |ent AS (
             |  SELECT cc.doc_id, max(cc.source) AS source,
             |    CAST(sum($charEntropyMicros) AS BIGINT) AS ent_micros
             |  FROM cc JOIN nn ON nn.doc_id = cc.doc_id
             |  GROUP BY cc.doc_id),
             |tok AS (
             |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents)
             |SELECT e.source,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(t.n_tok) AS BIGINT) AS tot_tok,
             |  CAST(sum(t.n_tok) // count(*) AS BIGINT) AS avg_tok,
             |  CAST(sum(e.ent_micros) // count(*) AS BIGINT) AS avg_entropy_micros
             |FROM ent e JOIN tok t ON t.doc_id = e.doc_id
             |GROUP BY e.source
             |ORDER BY e.source""".stripMargin),
      "per-source curation dashboard: doc counts, token mass, floor-average char entropy — the q81-cap / q130-temperature decision table; per-doc stage is q135's zero-shuffle shape, one source-keyed exchange"),

    Q(
      "q148_nb_quality_classifier",
      (s, d) => {
        // Distilled quality classifier (the fasttext-filter pattern of
        // GPT-3/CCNet/DCLM: train a CHEAP linear classifier on labels
        // from an expensive gate, then score everything): naive-Bayes
        // token log-odds with labels from q75's Gopher gate
        // ([[gopherFlagged]] — the SAME expression tree, so gate and
        // labels cannot drift). Per-token weight = Laplace-smoothed
        // ln p(tok|keep) − ln p(tok|drop) floored to int64 micros
        // ([[nbTokenMicros]], one shared IEEE tree); per-doc score =
        // prior + Σ tf·weight — an order-independent integer sum, the
        // q131 discipline. SCALE: the model is one token-keyed count
        // aggregate (vocabulary-sized); scoring joins the (doc, tok, tf)
        // postings back to the model on the token key — q133's shuffle
        // class — and the 1-row totals/prior frames ride cross-joined
        // broadcasts. At 100 TB the model above a df floor is
        // broadcast-sized (Zipf tail is singletons), turning the scoring
        // join into a broadcast (q105's documented shape).
        // r12 verdict #5: the scored frame is built ONCE per (session,
        // dir) and shared with q151 via the exact-integer parquet
        // artifact memo — q151 no longer re-runs the whole fit
        nbScoredShared(s, d)
          .select(col("doc_id"), col("n_terms"), col("score_micros"), col("nb_keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""$nbCtes
             |SELECT doc_id, n_terms, score_micros,
             |  CAST(score_micros > 0 AS BIGINT) AS nb_keep
             |FROM sc2
             |ORDER BY doc_id""".stripMargin),
      "distilled quality classifier (fasttext-filter pattern): naive-Bayes token log-odds trained on q75's Gopher-gate labels, scored as prior + Σ tf·weight in exact integer micros — token-keyed model agg + postings join (q133's shuffle class), broadcast totals/prior"),

    Q(
      "q151_nb_calibration",
      (s, d) =>
        // The validation step of the distill workflow: before the cheap
        // classifier replaces the expensive gate at 100 TB, measure its
        // agreement — a (gate_keep × nb_keep) confusion table with the
        // score range per cell (the cells' score separation is what a
        // threshold-tuning pass would read). SCALE: q148's pipeline plus
        // one 4-row aggregate; nothing new shuffles — and the scored
        // frame itself is the SHARED per-session artifact (r12 verdict
        // #5), so this query pays only the 4-row aggregate.
        nbScoredShared(s, d)
          .groupBy(col("keep_flag").as("gate_keep"), col("nb_keep"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("score_micros")).as("min_score"),
            max(col("score_micros")).as("max_score"))
          .orderBy(col("gate_keep"), col("nb_keep")),
      Some(s"""$nbCtes
             |SELECT keep_flag AS gate_keep,
             |  CAST(score_micros > 0 AS BIGINT) AS nb_keep,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(min(score_micros) AS BIGINT) AS min_score,
             |  CAST(max(score_micros) AS BIGINT) AS max_score
             |FROM sc2
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin),
      "distilled-classifier calibration: (gate_keep x nb_keep) confusion table with per-cell doc counts and score ranges — the agreement check before q148's cheap classifier replaces the expensive gate; q148's pipeline plus one 4-row aggregate"))
}
