package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.{Decontam, Dedup, Multimodal, Similarity, TextAnalysis}

/** LLM-training-data operator inventory (driver mandate): near-dup dedup
  * (exact Jaccard, MinHash+LSH, SimHash), embedding near-dup + ANN,
  * language ID, fingerprinting, BPE-ish token counting, and multimodal
  * plumbing. Queries whose math is engine-portable carry DuckDB oracles;
  * hash-based operators (xxhash64 has no DuckDB twin) are registered
  * without oracle — the driver records a rows-only check and ScalaTest
  * proves them against their exact counterparts instead
  * (see operators/OperatorsSpec).
  */
object LlmQueries {

  /** DuckDB twin of [[TextAnalysis.withLangId]], generated from the SAME
    * stopword profiles: per-language hit ratios, then argmax with the
    * Spark side's exact tie-break (sort_array desc over (score, lang)
    * structs = max score, ties to the lexicographically LAST lang) spelled
    * out as a CASE ladder over langs in descending order.
    */
  private val langIdOracleSql: String = {
    val langsAsc = TextAnalysis.langProfiles.toSeq.sortBy(_._1).map(_._1)
    def score(lang: String) = s"s_$lang"
    val scoreDefs = langsAsc.map { lang =>
      val words = TextAnalysis.langProfiles(lang).map("'" + _ + "'").mkString(", ")
      s"  CAST(len(list_filter(toks, x -> x IN ($words))) AS DOUBLE)" +
        s" / greatest(len(toks), 1) AS ${score(lang)}"
    }.mkString(",\n")
    val langsDesc = langsAsc.sorted.reverse
    val caseArms = langsDesc.init.zipWithIndex.map { case (lang, i) =>
      val rest = langsDesc.drop(i + 1).map(score)
      val bound = if (rest.size == 1) rest.head else s"greatest(${rest.mkString(", ")})"
      s"       WHEN ${score(lang)} >= $bound THEN '$lang'"
    }.mkString("\n")
    val allScores = langsAsc.map(score).mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       |s AS (SELECT doc_id,
       |$scoreDefs
       |FROM t)
       |SELECT doc_id,
       |  CASE WHEN greatest($allScores) = 0 THEN 'und'
       |$caseArms
       |       ELSE '${langsDesc.last}' END AS predicted_lang,
       |  round(greatest($allScores), 4) AS lang_score
       |FROM s
       |ORDER BY doc_id""".stripMargin
  }

  /** Brute-force exact-Jaccard pair CTEs, shared by q30/q34/q87 (q34's LSH
    * banding catches a J>=0.8 pair with p ~ 1-2e-7 and verifies candidates
    * exactly, so it returns q30's pair set; q87 builds components on top).
    * RECURSIVE is declared here (it scopes the whole WITH list and is
    * harmless for the non-recursive consumers).
    */
  /** CTE body without the WITH prefix so q107's twin can splice it into a
    * WITH list that also carries ClusterQueries' centroid CTEs.
    */
  private[queries] val jaccardPairsBody: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS MATERIALIZED (SELECT doc_id,
      |         list_distinct(list_transform(range(len(t) - 2),
      |           i -> t[i+1] || '_' || t[i+2] || '_' || t[i+3])) AS sg
      |       FROM toks),
      |pairs AS MATERIALIZED (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
      |      / CAST(len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg)) AS DOUBLE) AS j
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)""".stripMargin

  private val jaccardPairsCte: String = "WITH RECURSIVE " + jaccardPairsBody

  private val jaccardOracleSql: String =
    s"""$jaccardPairsCte
      |SELECT doc_a, doc_b, round(j, 4) AS jaccard
      |FROM pairs WHERE j >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Transitive closure over the >=0.8 pairs (recursive CTE) ending in a
    * `comp(doc_id, component)` CTE — the same fixpoint the Spark-side
    * min-label propagation converges to. q87 selects it directly; q138
    * aggregates it into the size histogram.
    */
  private val componentsCte: String =
    s"""$jaccardPairsCte,
      |edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM pairs WHERE j >= 0.8
      |  UNION
      |  SELECT doc_b, doc_a FROM pairs WHERE j >= 0.8),
      |reach(n, m) AS (
      |  SELECT u, u FROM edges
      |  UNION
      |  SELECT r.n, e.v FROM reach r JOIN edges e ON r.m = e.u),
      |comp AS (
      |  SELECT n AS doc_id, min(m) AS component
      |  FROM reach GROUP BY n)""".stripMargin

  private val dedupComponentsSql: String =
    s"""$componentsCte
      |SELECT doc_id, component,
      |  CAST(doc_id = component AS BIGINT) AS keep
      |FROM comp
      |ORDER BY doc_id""".stripMargin

  /** q156's DuckDB twin: replay of `Multimodal.clipScorePairs` over the
    * text/plain corpus.
    *
    *  - "image tower" = the decodeStub fold, per feature slot d:
    *    acc ← (acc·31 + byte) mod 1000003 over bytes at positions ≡ d
    *    (mod 8), then /1000003 — intermediate values stay < 2^25, so
    *    the double arithmetic is exact integer math in both engines;
    *    bytes come from ascii() (the corpus is pure ASCII — octet_length
    *    == length tri-scale — so byte = code point), the per-slot order
    *    is pinned with list(… ORDER BY i), and list_reduce folds left
    *    like the JVM loop.
    *  - "text tower" = block-mean pooling: 8 explicit left-assoc 8-term
    *    sums / 8.0, matching poolTo's aggregate fold.
    *  - cosine rides list_inner_product ≡ VecDot (q28/q29 parity);
    *    round(…, 6) and the 0.2 threshold are evaluated on bit-equal
    *    doubles, so the keep decision cannot straddle a boundary
    *    differently. Zero-norm guard mirrored with CASE (keep 0,
    *    clip_cos NULL).
    *
    * The twin indexes CHARACTERS (text[i]) — valid because the corpus
    * is ASCII; the Spark side hashes the utf-8 BYTES, so a non-ASCII
    * corpus would need a blob-indexing rewrite, flagged loudly by the
    * oracle mismatch rather than silently diverging.
    */
  private val clipScoreOracleSql: String = {
    val pool = (0 until 8).map { b =>
      "(" + (1 to 8).map(i => s"v[${8 * b + i}]").mkString(" + ") + ") / 8.0"
    }.mkString(", ")
    s"""WITH pos AS (
      |  SELECT doc_id, i, (i-1) % 8 AS d, CAST(ascii(text[i]) AS DOUBLE) AS b
      |  FROM (SELECT doc_id, text, unnest(range(1, length(text)+1)) AS i FROM documents)),
      |fc AS (
      |  SELECT doc_id, d,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(b ORDER BY i)),
      |      (acc, x) -> fmod(acc * 31.0 + x, 1000003.0)) / 1000003.0 AS f
      |  FROM pos GROUP BY doc_id, d),
      |ivt AS (
      |  SELECT doc_id, list(f ORDER BY d) AS iv FROM fc GROUP BY doc_id),
      |tvt AS (
      |  SELECT vec_id, [$pool] AS tv
      |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)),
      |sc AS (
      |  SELECT d.doc_id AS media_id,
      |    list_inner_product(d.iv, t.tv) AS ip,
      |    sqrt(list_inner_product(d.iv, d.iv)) AS i_norm,
      |    sqrt(list_inner_product(t.tv, t.tv)) AS t_norm
      |  FROM ivt d JOIN tvt t ON d.doc_id = t.vec_id)
      |SELECT media_id,
      |  CASE WHEN i_norm > 0 AND t_norm > 0
      |       THEN round(ip / (i_norm * t_norm), 6) END AS clip_cos,
      |  CAST(CASE WHEN i_norm > 0 AND t_norm > 0 AND ip / (i_norm * t_norm) >= 0.2
      |       THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM sc
      |ORDER BY media_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q(
      "q30_docs_shingle_jaccard",
      (s, d) =>
        Dedup.shingleJaccardPairs(documents(s, d), threshold = 0.8)
          .orderBy(col("doc_a"), col("doc_b")),
      Some(jaccardOracleSql),
      "exact 3-gram Jaccard near-dup pairs: Spark uses an inverted-index join, oracle brute-forces — same answer"),

    Q(
      "q154_shingle_jaccard_capped",
      (s, d) =>
        // q30's 100 TB configuration (r10 verdict #4): shingles appearing
        // in more than dfCap=16 docs are dropped BEFORE pair generation —
        // a viral boilerplate shingle otherwise explodes its posting list
        // into |postings|² pairs on one row, and carries ~no near-dup
        // signal anyway. Capped Jaccard is a STRICT LOWER BOUND on exact
        // Jaccard (denominators stay the FULL per-doc set sizes; the cap
        // only removes common-shingle evidence), so the capped pair set
        // is always a subset of q30's — OperatorsSpec pins both
        // properties, ShuffleGrowthSpec pins the flattened shuffle. The
        // cap is a no-op at sf0.01 (max shingle df = 7) and bites at
        // sf0.1 (669 shingles over the cap; 178 of q30's 256 pairs
        // survive), so the tri-scale soak exercises both regimes of the
        // SAME oracle SQL. 16 = the duplicate-cluster scale this corpus
        // actually has: at cap 8 whole >8-copy clusters lose ALL their
        // shared shingles and the result collapses to empty.
        Dedup.shingleJaccardPairs(documents(s, d), threshold = 0.8,
          dfCap = Some(16))
          .orderBy(col("doc_a"), col("doc_b")),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |sh AS MATERIALIZED (SELECT doc_id,
             |         list_distinct(list_transform(range(len(t) - 2),
             |           i -> t[i+1] || '_' || t[i+2] || '_' || t[i+3])) AS sg
             |       FROM toks),
             |ex AS MATERIALIZED (SELECT doc_id, unnest(sg) AS sgram FROM sh),
             |dfc AS (SELECT sgram, count(*) AS df FROM ex GROUP BY sgram),
             |capped AS (SELECT sgram FROM dfc WHERE df <= 16),
             |common AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    CAST(count(*) AS BIGINT) AS n_common
             |  FROM ex a
             |  JOIN capped c ON c.sgram = a.sgram
             |  JOIN ex b ON b.sgram = a.sgram AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |sz AS (SELECT doc_id, CAST(len(sg) AS BIGINT) AS n FROM sh)
             |SELECT doc_a, doc_b,
             |  round(CAST(n_common AS DOUBLE)
             |    / CAST(sa.n + sb.n - n_common AS DOUBLE), 4) AS jaccard
             |FROM common
             |JOIN sz sa ON sa.doc_id = doc_a
             |JOIN sz sb ON sb.doc_id = doc_b
             |WHERE CAST(n_common AS DOUBLE)
             |  / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.8
             |ORDER BY doc_a, doc_b""".stripMargin),
      "df-capped shingle Jaccard (q30's 100 TB configuration): shingles in > 16 docs dropped before pair generation, denominators keep FULL set sizes — a strict lower bound on exact Jaccard; cap is a no-op at sf0.01 and drops 78 of 256 pairs at sf0.1, oracle replays the capped algebra at both"),

    Q(
      "q31_docs_fingerprint",
      (s, d) =>
        graft.operators.Par.fanOut(documents(s, d))
          .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)),
             |    (a, b) -> (a * 31 + b) % 1000000000000000) AS fp
             |FROM documents
             |ORDER BY doc_id""".stripMargin),
      "order-sensitive polynomial rolling-hash fingerprint, engine-portable mod-1e15 arithmetic"),

    Q(
      "q32_docs_bpe_tokens",
      (s, d) =>
        documents(s, d)
          .select(
            col("doc_id"),
            TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
            size(split(col("text"), " ")).cast("long").as("n_ws"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  len(regexp_extract_all(lower(text), '${TextAnalysis.bpePattern}')) AS n_bpe,
              |  len(string_split(text, ' ')) AS n_ws
              |FROM documents
              |ORDER BY doc_id""".stripMargin),
      "BPE-ish subword counting via shared regex"),

    Q(
      "q33_emb_neardup_pairs",
      (s, d) => Similarity.topKPairs(embeddings(s, d), k = 20),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |p AS (
             |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |    list_inner_product(a.v, b.v)
             |      / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) AS c
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
             |SELECT vec_a, vec_b, round(c, 6) AS cos_sim
             |FROM p
             |ORDER BY c DESC, vec_a, vec_b
             |LIMIT 20""".stripMargin),
      "embedding near-dup: top-20 cosine pairs across the corpus (brute-force baseline)"),

    Q(
      "q34_docs_minhash_neardup",
      (s, d) =>
        Dedup.minhashLshPairs(documents(s, d), threshold = 0.8)
          .orderBy(col("doc_a"), col("doc_b")),
      Some(jaccardOracleSql), // == q30's oracle; see jaccardPairsCte doc
      "MinHash(128)+LSH(32 bands) near-dup pairs with exact-Jaccard verification; ScalaTest proves equality with q30"),

    Q(
      "q87_dedup_components",
      (s, d) =>
        Dedup.dedupDecisions(documents(s, d), threshold = 0.8)
          .orderBy(col("doc_id")),
      Some(dedupComponentsSql),
      "dedup decisions: connected components over near-dup pairs (min-label propagation vs recursive-CTE closure), keep = lowest doc_id per component"),

    Q(
      "q35_docs_simhash",
      (s, d) =>
        Dedup.withSimhash(documents(s, d))
          .select(col("doc_id"), col("simhash"))
          .orderBy(col("doc_id")),
      None,
      "64-bit SimHash fingerprints (xxhash64-based; no DuckDB twin)"),

    Q(
      "q36_docs_simhash_pairs",
      (s, d) =>
        Dedup.simhashPairs(documents(s, d), maxHamming = 3)
          .orderBy(col("doc_a"), col("doc_b")),
      None,
      "SimHash banded Hamming-distance near-dup candidates"),

    Q(
      "q37_ann_topk",
      (s, d) => Similarity.annTopK(embeddings(s, d), queryVecId = 0L, k = 10),
      None,
      "LSH ANN top-10 (32 tables × 6 hyperplane bits, MULTI-PROBE query: +2 lowest-margin bit-flip buckets per table — recall floor raised 0.5→0.7, measured 1.0 at sf0.1, with the stored corpus index untouched); floor in ScalaTest + RecallProbe"),

    Q(
      "q70_emb_neardup_lsh",
      (s, d) =>
        Similarity.nearDupPairsLsh(embeddings(s, d), minCos = 0.35)
          .orderBy(col("vec_a"), col("vec_b")),
      None,
      "thresholded embedding-cosine near-dup with LSH prefilter (scale path; recall floor vs brute force in ScalaTest)"),

    Q(
      "q63_ivf_topk",
      (s, d) => Similarity.ivfTopK(embeddings(s, d), queryVecId = 0L, kResults = 10),
      None,
      "IVF-flat ANN (16 LEARNED lists — 2 exact Lloyd iterations — probe 6): complementary index family to hyperplane LSH; recall floor in ScalaTest + RecallProbe"),

    Q(
      "q64_media_frames",
      (s, d) =>
        Multimodal.sampleFrames(
          Multimodal.mediaFromDocuments(documents(s, d)))
          .select(col("media_id"), col("frame_idx"),
            octet_length(col("frame")).cast("long").as("frame_bytes"))
          .orderBy(col("media_id"), col("frame_idx")),
      // The slicing contract (64-byte chunks, every 2nd kept, partial tail)
      // is pure arithmetic — the oracle recomputes it from payload lengths.
      Some("""WITH m AS (
             |  SELECT doc_id AS media_id, octet_length(CAST(text AS BLOB)) AS n
             |  FROM documents),
             |f AS (
             |  SELECT media_id, n,
             |    unnest(range(CAST(ceil(n / 64.0) AS BIGINT))) AS frame_idx
             |  FROM m)
             |SELECT media_id, frame_idx, least(64, n - frame_idx * 64) AS frame_bytes
             |FROM f
             |WHERE frame_idx % 2 = 0
             |ORDER BY media_id, frame_idx""".stripMargin),
      "frame sampling plumbing: one row per sampled chunk of the media payload; oracle checks the slicing arithmetic"),

    Q(
      "q38_docs_langid",
      (s, d) =>
        TextAnalysis.withLangId(documents(s, d))
          .select(col("doc_id"), col("predicted_lang"), col("lang_score"))
          .orderBy(col("doc_id")),
      Some(langIdOracleSql),
      "heuristic stopword-profile language ID (oracle replays the argmax + lexicographic-desc tie-break as a CASE ladder)"),

    Q(
      "q39_media_stats",
      (s, d) =>
        Multimodal.mediaFromDocuments(documents(s, d))
          .select(col("media_id"), col("mime"),
            octet_length(col("media")).cast("long").as("n_bytes"))
          .orderBy(col("media_id")),
      Some("""SELECT doc_id AS media_id, 'text/plain' AS mime,
             |  octet_length(CAST(text AS BLOB)) AS n_bytes
             |FROM documents
             |ORDER BY media_id""".stripMargin),
      "multimodal plumbing: binary payload column with byte-level stats"),

    Q(
      "q40_media_features",
      (s, d) =>
        Multimodal.extractFeatures(
          Multimodal.mediaFromDocuments(documents(s, d)))
          .toDF()
          .select(col("media_id"), col("n_bytes"), round(col("feat_norm"), 6).as("feat_norm"))
          .orderBy(col("media_id")),
      None,
      "per-partition batched feature extraction over binary media (decode STUB, real plumbing)"),

    Q(
      "q156_clip_score_filter",
      (s, d) =>
        // cross-modal curation gate: CLIP-score analog over aligned
        // (image, caption) pairs — media payloads from the documents
        // table (q39's wrapper), captions from the embeddings table,
        // aligned on media_id = vec_id. Keep decision at the minCos
        // threshold (the LAION filter shape). ORACLE-BEARING since r12:
        // the corpus is text/plain, so the "image tower" is the
        // deterministic stub fold — pure integer-in-double arithmetic
        // (acc·31 + byte mod 1000003, exactly representable) the DuckDB
        // twin replays byte-for-byte from ascii() codes (ASCII corpus,
        // octet==char verified tri-scale); pooling/cosine ride the
        // proven list_inner_product ≡ VecDot parity. MultimodalSpec
        // additionally recomputes every score from the JVM encoders.
        Multimodal.clipScorePairs(
          Multimodal.mediaFromDocuments(documents(s, d)),
          embeddings(s, d))
          .orderBy(col("media_id")),
      Some(clipScoreOracleSql),
      "cross-modal CLIP-score filter (stub encoders, real dataflow): cosine of image features vs block-pooled caption embedding per aligned pair + keep flag at the threshold — one media scan, one embedding scan, one equi-join; DuckDB twin replays the stub fold byte-for-byte"),

    Q(
      "q55_approx_distinct_users",
      (s, d) =>
        events(s, d)
          .groupBy(col("event_type"))
          .agg(
            approx_count_distinct(col("user_id")).as("approx_users"),
            countDistinct(col("user_id")).as("exact_users"))
          .orderBy(col("event_type")),
      None,
      "HLL++ sketch vs exact distinct (no oracle: DuckDB's HLL differs; tolerance proven in ScalaTest)"),

    Q(
      "q56_docs_dedup_by_hash",
      (s, d) =>
        graft.operators.Dedup.exactDedupByHash(documents(s, d))
          .orderBy(col("keep_id")),
      // Oracle groups by the text itself: identical answer unless a 64-bit
      // hash+length collision merges distinct docs (odds ~n²/2⁶⁵; the
      // ScalaTest q56==q24 equality pins the same fact).
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents
             |GROUP BY text
             |ORDER BY keep_id""".stripMargin),
      "exact dedup scale path: 12-byte (hash,len) shuffle key instead of the document body; equals q24 in ScalaTest"),

    Q(
      "q41_docs_sketch",
      (s, d) =>
        // Serialized to one scalar string per doc: the driver's pandas-side
        // hash compare cannot sort array cells (Registry parity rule).
        TextAnalysis.withSketch(documents(s, d))
          .select(col("doc_id"),
            concat_ws("_", col("sketch").cast("array<string>")).as("sketch"))
          .orderBy(col("doc_id")),
      None,
      "winnowing-style min-hash sketch (k smallest 4-gram hashes) per doc, serialized scalar"),

    Q(
      "q124_incremental_dedup",
      (s, d) => {
        // Incremental (delta-vs-corpus) dedup decisions — the production
        // shape at 100 TB: a daily batch is screened against the standing
        // corpus index, the corpus is never re-deduped. Here the batch is
        // carved deterministically from `documents` with q73's portable
        // multiplicative-hash bucket (corpus = buckets 0–79, incoming =
        // 80–99), so DuckDB replays the same split. Signals per incoming
        // doc: lowest-id exact corpus match, first earlier same-text doc
        // within the batch, lowest-id Jaccard≥0.8 corpus match; keep =
        // nothing fired. SCALE: the cross-set join touches only
        // delta-side postings against the (stored, shingle-bucketed)
        // corpus index — see Dedup.crossJaccardMatches.
        val b = documents(s, d)
          .withColumn("bucket", pmod(col("doc_id") * lit(2654435761L), lit(100)))
        val corpus = b.filter(col("bucket") < 80).select(col("doc_id"), col("text"))
        val incoming = b.filter(col("bucket") >= 80).select(col("doc_id"), col("text"))
        graft.operators.Dedup.incrementalDedup(incoming, corpus, threshold = 0.8)
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (
             |  SELECT doc_id, text, (doc_id * 2654435761) % 100 AS bucket FROM documents),
             |corpus AS (SELECT doc_id, text FROM b WHERE bucket < 80),
             |inc AS (SELECT doc_id, text FROM b WHERE bucket >= 80),
             |exact AS (
             |  SELECT i.doc_id, min(c.doc_id) AS exact_dup_of
             |  FROM inc i LEFT JOIN corpus c ON c.text = i.text
             |  GROUP BY i.doc_id),
             |batch AS (
             |  SELECT i.doc_id, min(j.doc_id) AS batch_dup_of
             |  FROM inc i LEFT JOIN inc j ON j.text = i.text AND j.doc_id < i.doc_id
             |  GROUP BY i.doc_id),
             |si AS MATERIALIZED (
             |  SELECT doc_id, list_distinct(list_transform(range(len(t) - 2),
             |    i -> t[i+1] || '_' || t[i+2] || '_' || t[i+3])) AS sg
             |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM inc)),
             |sc AS MATERIALIZED (
             |  SELECT doc_id, list_distinct(list_transform(range(len(t) - 2),
             |    i -> t[i+1] || '_' || t[i+2] || '_' || t[i+3])) AS sg
             |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)),
             |near AS (
             |  SELECT i.doc_id, min(c.doc_id) AS near_dup_of
             |  FROM si i JOIN sc c
             |    ON len(list_intersect(i.sg, c.sg)) > 0
             |    AND CAST(len(list_intersect(i.sg, c.sg)) AS DOUBLE)
             |      / CAST(len(i.sg) + len(c.sg) - len(list_intersect(i.sg, c.sg)) AS DOUBLE)
             |      >= 0.8
             |  GROUP BY i.doc_id)
             |SELECT i.doc_id, e.exact_dup_of, bt.batch_dup_of, nr.near_dup_of,
             |  CAST(e.exact_dup_of IS NULL AND bt.batch_dup_of IS NULL
             |       AND nr.near_dup_of IS NULL AS BIGINT) AS keep
             |FROM inc i
             |LEFT JOIN exact e ON e.doc_id = i.doc_id
             |LEFT JOIN batch bt ON bt.doc_id = i.doc_id
             |LEFT JOIN near nr ON nr.doc_id = i.doc_id
             |ORDER BY i.doc_id""".stripMargin),
      "incremental dedup: delta batch screened against the standing corpus (exact + within-batch + cross-set Jaccard>=0.8 signals, keep flag) — delta-side postings only; corpus index is stored at scale"),

    Q(
      "q134_split_leakage",
      (s, d) => {
        // Train/test leakage audit: near-duplicate pairs (exact 3-gram
        // Jaccard >= 0.8, q30's inverted-index operator) whose endpoints
        // landed in DIFFERENT q73 train/val/test splits — the pairs a
        // random holdout silently leaks through when dedup runs before
        // splitting but components aren't split-aware. SCALE: the pair
        // generator is the graded sub-quadratic shape; the split label is
        // ARITHMETIC on doc_id (q73's multiplicative-congruential bucket),
        // so the audit adds two projections and a filter to the pair
        // frame — no join, no extra shuffle.
        def splitOf(id: org.apache.spark.sql.Column) = {
          val bucket = pmod(id * lit(2654435761L), lit(100))
          when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
        }
        Dedup.shingleJaccardPairs(documents(s, d), threshold = 0.8)
          .withColumn("split_a", splitOf(col("doc_a")))
          .withColumn("split_b", splitOf(col("doc_b")))
          .filter(col("split_a") =!= col("split_b"))
          .select(col("doc_a"), col("doc_b"), col("jaccard"),
            col("split_a"), col("split_b"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""$jaccardPairsCte
             |SELECT * FROM (
             |  SELECT doc_a, doc_b, round(j, 4) AS jaccard,
             |    CASE WHEN (doc_a * 2654435761) % 100 < 90 THEN 'train'
             |         WHEN (doc_a * 2654435761) % 100 < 95 THEN 'val'
             |         ELSE 'test' END AS split_a,
             |    CASE WHEN (doc_b * 2654435761) % 100 < 90 THEN 'train'
             |         WHEN (doc_b * 2654435761) % 100 < 95 THEN 'val'
             |         ELSE 'test' END AS split_b
             |  FROM pairs WHERE j >= 0.8)
             |WHERE split_a <> split_b
             |ORDER BY doc_a, doc_b""".stripMargin),
      "train/test leakage audit: near-dup pairs (J>=0.8) straddling q73's deterministic splits — dedup-then-split contamination surfaced as an explicit pair list; split labels are doc_id arithmetic, zero extra shuffles"),

    Q(
      "q138_dedup_report",
      (s, d) => {
        // Dedup observability: the component-size histogram every dedup
        // run reports before anyone trusts its removals — how many
        // near-dup groups of each size exist, how many docs they touch,
        // and how many rows a keep-one policy deletes. A spike at large
        // sizes means boilerplate is welding unrelated docs together
        // (threshold or df-cap problem); all-size-2 means mostly exact
        // re-uploads. SCALE: two component-keyed aggregates over the
        // component frame (docs-in-pairs sized, not corpus sized), then a
        // histogram agg on the bounded size key.
        Dedup.componentSizeReport(Dedup.connectedComponents(
          Dedup.shingleJaccardPairs(documents(s, d), threshold = 0.8)
            .select(col("doc_a"), col("doc_b"))))
      },
      Some(s"""$componentsCte,
             |szs AS (
             |  SELECT component, count(*) AS sz FROM comp GROUP BY component)
             |SELECT sz, CAST(count(*) AS BIGINT) AS n_components,
             |  CAST(sz * count(*) AS BIGINT) AS n_docs,
             |  CAST((sz - 1) * count(*) AS BIGINT) AS n_removed
             |FROM szs
             |GROUP BY sz
             |ORDER BY sz""".stripMargin),
      "dedup-run report: near-dup component-size histogram (groups / docs touched / rows a keep-one policy removes) — the trust-but-verify table before acting on dedup decisions; component-keyed aggregates only"),

    Q(
      "q143_eval_decontam",
      (s, d) => {
        // Benchmark decontamination (the GPT-3 appendix-C check, PaLM's
        // span variant): a train-split doc is CONTAMINATED when it
        // contains any exact 13-gram that also occurs in the held-out
        // test split. Distinct from q134's near-dup leakage audit
        // (whole-doc J >= 0.8 pairs): a verbatim benchmark answer quoted
        // inside an otherwise-unrelated doc never clears a whole-doc
        // Jaccard bar but is exactly what an eval-overlap check must
        // catch. Output carries the matched window positions
        // (first/last hit) so a span-removal policy (PaLM) can cut the
        // overlap without dropping the doc. SCALE: the join is
        // deliberately UNHINTED — a real benchmark eval side is MBs, so
        // the size-based pick (static estimate or AQE runtime stats)
        // lands it as the broadcast build side (PlanSpec pins the
        // broadcast join at small scale) and the exploded train n-grams
        // never shuffle before their per-doc aggregate; when the eval side is
        // instead an in-corpus split (as here — it grows WITH the
        // corpus, so a forced broadcast hint would be a 100 TB driver
        // OOM, exactly ScaleGuardSpec's fence), the same plan degrades
        // to a hash join of two slim (h, id) posting streams — q127's
        // shuffle volume class — with only matched rows reaching the
        // final doc_id exchange. The 13-gram hash is md5 for the DuckDB
        // twin; at 100 TB use xxhash64 (q127's documented substitution).
        // gram-hit pipeline shared with q147's span-removal policy layer
        // (operators/Decontam — single source of truth for the split
        // convention and window hashing)
        Decontam.gramHits(documents(s, d), n = 13)
          .groupBy(col("doc_id"))
          .agg(
            countDistinct(col("h")).as("n_grams_hit"),
            countDistinct(col("eval_doc")).as("n_eval_docs"),
            min(col("i")).cast("long").as("first_hit_pos"),
            max(col("i")).cast("long").as("last_hit_pos"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (
             |  SELECT doc_id, string_split(text, ' ') AS t,
             |    (doc_id * 2654435761) % 100 AS bucket
             |  FROM documents),
             |ev AS (
             |  SELECT DISTINCT md5(array_to_string(t[i:i+12], ' ')) AS h,
             |    doc_id AS eval_doc
             |  FROM (SELECT doc_id, t,
             |          unnest(range(1, greatest(len(t) - 12, 0) + 1)) AS i
             |        FROM b WHERE bucket >= 95)),
             |tr AS (
             |  SELECT doc_id, i, md5(array_to_string(t[i:i+12], ' ')) AS h
             |  FROM (SELECT doc_id, t,
             |          unnest(range(1, greatest(len(t) - 12, 0) + 1)) AS i
             |        FROM b WHERE bucket < 90))
             |SELECT tr.doc_id,
             |  count(DISTINCT tr.h) AS n_grams_hit,
             |  count(DISTINCT ev.eval_doc) AS n_eval_docs,
             |  CAST(min(tr.i) AS BIGINT) AS first_hit_pos,
             |  CAST(max(tr.i) AS BIGINT) AS last_hit_pos
             |FROM tr JOIN ev USING (h)
             |GROUP BY tr.doc_id
             |ORDER BY tr.doc_id""".stripMargin),
      "benchmark decontamination (GPT-3 style): train docs containing any exact 13-gram from the test split, with matched-span bounds for PaLM-style span removal; unhinted join — a small (real-benchmark) eval side becomes an AQE runtime broadcast, an in-corpus split degrades to a slim (h,id) postings hash join"),

    Q(
      "q144_soft_dedup_weights",
      (s, d) => {
        // Soft dedup (the SoftDeDup reweighting family): instead of the
        // q107 keep-one HARD removal, every doc stays in the corpus but
        // its sampling weight is 1/|component| of its near-dup component
        // — each duplicate cluster contributes total mass ~1 epoch-wise,
        // and borderline members (which hard dedup deletes on a coin
        // flip at the threshold) keep proportional signal. Weight is the
        // exact-integer rounded micros (1e6 + sz/2) DIV sz — no float
        // division in the comparison surface. Singletons (docs with no
        // near-dup partner) get their own doc_id as component and weight
        // 1.0. SCALE: components run on the docs-in-pairs frame (q87's
        // graded shape); the join back to the full corpus is doc_id-keyed
        // against that much smaller weighted frame.
        val comps = Dedup.connectedComponents(
          Dedup.shingleJaccardPairs(documents(s, d), threshold = 0.8)
            .select(col("doc_a"), col("doc_b")))
        val sizes = comps.groupBy(col("component")).agg(count(lit(1)).as("sz"))
        val weighted = comps.join(sizes, "component")
          .select(col("doc_id"), col("component"), col("sz"))
        documents(s, d).select(col("doc_id"))
          .join(weighted, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("component"),
            coalesce(col("sz"), lit(1L)).as("group_sz"))
          .select(col("doc_id"), col("component"), col("group_sz"),
            expr("(1000000 + group_sz DIV 2) DIV group_sz").as("weight_micros"))
          .orderBy(col("doc_id"))
      },
      Some(s"""$componentsCte,
             |szs AS (
             |  SELECT component, count(*) AS sz FROM comp GROUP BY component),
             |w AS (
             |  SELECT c.doc_id, c.component, s.sz
             |  FROM comp c JOIN szs s USING (component))
             |SELECT d.doc_id,
             |  coalesce(w.component, d.doc_id) AS component,
             |  coalesce(w.sz, 1) AS group_sz,
             |  (1000000 + coalesce(w.sz, 1) // 2) // coalesce(w.sz, 1)
             |    AS weight_micros
             |FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
             |ORDER BY d.doc_id""".stripMargin),
      "soft dedup (SoftDeDup-style reweighting): every doc keeps sampling weight 1/|near-dup component| in exact integer micros instead of q107's hard keep-one removal — duplicate clusters contribute ~unit mass, borderline members keep proportional signal"),

    Q(
      "q147_decontam_spans",
      (s, d) => {
        // The POLICY layer over q143's audit (PaLM-style span removal):
        // merge each contaminated doc's matched 13-gram windows into
        // maximal removal spans (overlapping/adjacent windows coalesce —
        // gaps-and-islands over hit rows) and budget the cut: how many
        // spans, how many tokens go, how many remain. The actionable
        // report before rewriting text — a doc whose tokens_kept is
        // near zero should be DROPPED, not scrubbed (the rewrite itself
        // is Decontam.scrubText, pinned by DecontamSpec: the scrubbed
        // corpus re-audits clean). SCALE: the gram join is q143's (slim
        // posting streams / AQE broadcast of a real benchmark side); the
        // span sweep windows are partitioned per doc over HIT rows only,
        // and every output column is exact integer arithmetic.
        val n = 13
        val docs = documents(s, d)
        val spans = Decontam.mergedSpans(Decontam.gramHits(docs, n), n)
        val dl = docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        spans.groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_spans"),
            sum(col("hi") - col("lo") + 1).cast("long").as("tokens_removed"),
            min(col("lo")).cast("long").as("first_lo"),
            max(col("hi")).cast("long").as("last_hi"))
          .join(dl, "doc_id")
          .select(col("doc_id"), col("n_spans"), col("tokens_removed"),
            col("n_tokens"),
            (col("n_tokens") - col("tokens_removed")).as("tokens_kept"),
            col("first_lo"), col("last_hi"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (
             |  SELECT doc_id, string_split(text, ' ') AS t,
             |    (doc_id * 2654435761) % 100 AS bucket
             |  FROM documents),
             |ev AS (
             |  SELECT DISTINCT md5(array_to_string(t[i:i+12], ' ')) AS h
             |  FROM (SELECT doc_id, t,
             |          unnest(range(1, greatest(len(t) - 12, 0) + 1)) AS i
             |        FROM b WHERE bucket >= 95)),
             |tr AS (
             |  SELECT doc_id, i, md5(array_to_string(t[i:i+12], ' ')) AS h
             |  FROM (SELECT doc_id, t,
             |          unnest(range(1, greatest(len(t) - 12, 0) + 1)) AS i
             |        FROM b WHERE bucket < 90)),
             |hit AS (SELECT DISTINCT tr.doc_id, tr.i FROM tr JOIN ev USING (h)),
             |m AS (
             |  SELECT doc_id, i,
             |    max(i + 12) OVER (PARTITION BY doc_id ORDER BY i
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_hi
             |  FROM hit),
             |isl AS (
             |  SELECT doc_id, i,
             |    CAST(sum(CASE WHEN prev_hi IS NULL OR i > prev_hi + 1
             |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY i
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |      AS span_id
             |  FROM m),
             |sp AS (
             |  SELECT doc_id, span_id, min(i) AS lo, max(i) + 12 AS hi
             |  FROM isl GROUP BY doc_id, span_id),
             |ds AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             |    CAST(sum(hi - lo + 1) AS BIGINT) AS tokens_removed,
             |    CAST(min(lo) AS BIGINT) AS first_lo,
             |    CAST(max(hi) AS BIGINT) AS last_hi
             |  FROM sp GROUP BY doc_id),
             |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
             |       FROM documents)
             |SELECT ds.doc_id, n_spans, tokens_removed, n_tokens,
             |  n_tokens - tokens_removed AS tokens_kept, first_lo, last_hi
             |FROM ds JOIN dl USING (doc_id)
             |ORDER BY ds.doc_id""".stripMargin),
      "decontamination span-removal budget (PaLM-style): matched 13-gram windows merged into maximal spans per contaminated doc (gaps-and-islands over hit rows), with exact removed/kept token counts — the policy report q143's audit feeds; the text rewrite itself is Decontam.scrubText (DecontamSpec: scrubbed corpus re-audits clean)"),

    Q(
      "q149_media_phash_neardup",
      (s, d) =>
        // Perceptual-hash near-dup over the media table (the image-dedup
        // leg of the multimodal family, q39/q40/q64): decode → 64-bit
        // hash (REAL integer aHash for image mimes via javax.imageio;
        // the documented deterministic stub for mimes the JDK can't
        // decode — here the text/plain stand-in corpus) → the 4×16-bit
        // banded Hamming join shared with SimHash
        // (Dedup.bandedHammingPairs — recall EXACT for distance ≤ 3 by
        // pigeonhole). Rows-only: the hash lives decoder-side, not in
        // SQL; MultimodalSpec pins real-image behavior (re-encode →
        // Hamming 0, noise ≤ bar, distinct images far) and banding
        // equality against a brute-force all-pairs scan. SCALE: one
        // decode pass over media bytes, then slim (id, hash) rows only —
        // the band shuffle never carries payloads. EMPTY below sf0.1 is
        // the CORRECT answer: the corpus has no byte-identical media
        // there (first duplicates appear at sf0.1 — 8 groups → exactly 8
        // Hamming-0 pairs, pinned in MultimodalSpec); the r10 sf0.01
        // output's 25 "pairs" were short-payload stub-hash collisions,
        // removed by the r11 length-mixing fix (the advisor finding).
        Multimodal.phashNearDupPairs(
          Multimodal.mediaFromDocuments(documents(s, d)), maxHamming = 3)
          .orderBy(col("media_a"), col("media_b")),
      None,
      "image near-dup by 64-bit perceptual hash (real integer aHash for decodable images, deterministic stub otherwise) + the shared 4x16-bit banded Hamming join — exact recall at distance <= 3; rows-only, pinned by MultimodalSpec; empty below sf0.1 BY DESIGN (no byte-identical media there — prior nonzero counts were stub-hash false positives, fixed r11)"))
}
