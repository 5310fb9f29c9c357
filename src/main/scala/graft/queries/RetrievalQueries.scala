package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.VectorFunctions._

/** Retrieval-adjacent training-data operators: hard-negative mining for
  * contrastive training (q145) and hybrid lexical+dense rank fusion
  * (q146). Both compose the engine's existing retrieval legs — q131's
  * BM25 integer-micros scorer and q29's brute-force cosine — into the
  * next layer a training pipeline actually ships: picking negatives and
  * fusing rankers.
  */
object RetrievalQueries {

  /** q145's hard-negative band, interpolated into both engines — the
    * shared constant on [[graft.operators.Similarity]] (single source of
    * truth with q150's scale path and the specs that pin their
    * equivalence).
    */
  private val NegFloor = graft.operators.Similarity.HardNegFloor
  private val NegCeil = graft.operators.Similarity.HardNegCeil

  /** RRF constant (Cormack et al. 2009's k=60) and per-list depth. */
  private val RrfK = 60
  private val FuseDepth = 100

  /** The dense RRF leg (q29's cosine, vec_id 0 as the query embedding,
    * doc_id = vec_id corpus alignment): (doc_id, rank_dense) over the
    * top FuseDepth — ONE copy shared by q146 (recompute lexical leg)
    * and q170 (stored lexical leg), so the fused answers cannot drift.
    */
  private def denseRanks(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val emb = embeddings(s, d)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .withColumn("cos_raw", cosine(col("v"), col("qv")))
      .orderBy(col("cos_raw").desc, col("vec_id"))
      .limit(FuseDepth)
      // single-valued partition key on the bounded post-limit cut —
      // see Similarity.denseRanksStored (warning-free window)
      .withColumn("rank_dense",
        row_number().over(Window.partitionBy(pmod(col("vec_id"), lit(1)))
          .orderBy(col("cos_raw").desc, col("vec_id")))
          .cast("long"))
      .select(col("vec_id").as("doc_id"), col("rank_dense"))
  }

  /** The RRF fusion tail (exact integer micros, full-outer over the two
    * ≤FuseDepth legs) — shared by q146 and q170.
    */
  private def rrfFuse(lex: org.apache.spark.sql.DataFrame,
      dense: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_lex"), col("rank_dense"),
        (coalesce(expr(s"1000000 DIV ($RrfK + rank_lex)"), lit(0L)) +
          coalesce(expr(s"1000000 DIV ($RrfK + rank_dense)"), lit(0L)))
          .as("rrf_micros"))
      .orderBy(col("rrf_micros").desc, col("doc_id"))
      .limit(20)

  /** q146's full oracle SQL — verbatim for q170 too: the stored lexical
    * leg is bit-identical to the recompute (exact stored integers + the
    * one shared bm25Micros tree), so fusing it cannot change a row.
    */
  private val rrfOracleSql: String =
    s"""WITH dl AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
       |st AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_dl FROM dl),
       |tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token IN (${DocQueries.bm25Terms.map("'" + _ + "'").mkString(", ")})
       |  GROUP BY doc_id, token),
       |dfc AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
       |bm AS (
       |  SELECT tf.doc_id,
       |    CAST(sum(${DocQueries.bm25Micros}) AS BIGINT) AS score_micros
       |  FROM tf JOIN dfc USING (token) JOIN dl USING (doc_id) CROSS JOIN st
       |  GROUP BY tf.doc_id),
       |lex AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY score_micros DESC, doc_id) AS rank_lex
       |  FROM bm ORDER BY score_micros DESC, doc_id LIMIT $FuseDepth),
       |q AS (
       |  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
       |  WHERE vec_id = 0),
       |dn AS (
       |  SELECT vec_id,
       |    list_inner_product(CAST(embedding AS DOUBLE[]), qv)
       |      / (sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
       |                                 CAST(embedding AS DOUBLE[])))
       |         * sqrt(list_inner_product(qv, qv))) AS cos_raw
       |  FROM embeddings, q WHERE vec_id <> 0),
       |dense AS (
       |  SELECT vec_id AS doc_id,
       |    row_number() OVER (ORDER BY cos_raw DESC, vec_id) AS rank_dense
       |  FROM dn ORDER BY cos_raw DESC, vec_id LIMIT $FuseDepth)
       |SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
       |  rank_lex, rank_dense,
       |  COALESCE(1000000 // ($RrfK + rank_lex), 0)
       |    + COALESCE(1000000 // ($RrfK + rank_dense), 0) AS rrf_micros
       |FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
       |ORDER BY rrf_micros DESC, doc_id
       |LIMIT 20""".stripMargin

  /** The PER-QUERY RRF fusion tail for batched hybrid retrieval
    * (q175): full-outer on (query_id, doc_id) over the two <= depth
    * per-query legs, exact integer micros, per-query top-10 with ties
    * on doc_id. The fusion frame is bounded at 2·|batch|·FuseDepth rows
    * whatever the corpus size.
    */
  private def rrfFuseBatch(lex: org.apache.spark.sql.DataFrame,
      dense: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val byQuery = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micros").desc, col("doc_id"))
    lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"), col("rank_lex"), col("rank_dense"),
        (coalesce(expr(s"1000000 DIV ($RrfK + rank_lex)"), lit(0L)) +
          coalesce(expr(s"1000000 DIV ($RrfK + rank_dense)"), lit(0L)))
          .as("rrf_micros"))
      .withColumn("rk", row_number().over(byQuery).cast("long"))
      .filter(col("rk") <= 10)
      .select(col("query_id"), col("rk"), col("doc_id"), col("rank_lex"),
        col("rank_dense"), col("rrf_micros"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** q173's fixed query batch — a literal (the q131 single-query
    * contract batched; a dynamic batch would broadcast a terms table,
    * same plan shape). Terms drawn from the corpus vocabulary so every
    * query has hits.
    */
  private val LexBatch: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "merge", "window"),
    1L -> Seq("hash", "join", "filter"),
    2L -> Seq("vector", "stream", "scan"))

  private def lexBatchOracleSql: String = {
    val allTerms = LexBatch.flatMap(_._2).distinct
    val qtRows = LexBatch.flatMap { case (qid, ts) =>
      ts.map(t => s"($qid, '$t')")
    }.mkString(", ")
    s"""WITH dl AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
       |st AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_dl FROM dl),
       |tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token IN (${allTerms.map("'" + _ + "'").mkString(", ")})
       |  GROUP BY doc_id, token),
       |dfc AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
       |qt(query_id, token) AS (VALUES $qtRows),
       |sc AS (
       |  SELECT tf.doc_id, tf.token, ${DocQueries.bm25Micros} AS c_micros
       |  FROM tf JOIN dfc USING (token) JOIN dl USING (doc_id) CROSS JOIN st),
       |pq AS (
       |  SELECT qt.query_id, sc.doc_id,
       |    CAST(count(*) AS BIGINT) AS n_hit,
       |    CAST(sum(c_micros) AS BIGINT) AS score_micros
       |  FROM sc JOIN qt USING (token)
       |  GROUP BY qt.query_id, sc.doc_id),
       |r AS (
       |  SELECT query_id, doc_id, n_hit, score_micros,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_micros DESC, doc_id) AS rk
       |  FROM pq)
       |SELECT CAST(query_id AS BIGINT) AS query_id, rk, doc_id, n_hit,
       |  score_micros
       |FROM r WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin
  }

  /** q175's full oracle: the lexBatch scoring CTEs cut at rank <=
    * FuseDepth per query, the dense leg replayed per query embedding
    * (vec_id 0..|batch|-1, self excluded), full-outer fusion on
    * (query_id, doc_id), exact integer micros, per-query top-10.
    */
  private def rrfBatchOracleSql: String = {
    val allTerms = LexBatch.flatMap(_._2).distinct
    val qtRows = LexBatch.flatMap { case (qid, ts) =>
      ts.map(t => s"($qid, '$t')")
    }.mkString(", ")
    s"""WITH dl AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
       |st AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_dl FROM dl),
       |tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token IN (${allTerms.map("'" + _ + "'").mkString(", ")})
       |  GROUP BY doc_id, token),
       |dfc AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
       |qt(query_id, token) AS (VALUES $qtRows),
       |sc AS (
       |  SELECT tf.doc_id, tf.token, ${DocQueries.bm25Micros} AS c_micros
       |  FROM tf JOIN dfc USING (token) JOIN dl USING (doc_id) CROSS JOIN st),
       |pq AS (
       |  SELECT CAST(qt.query_id AS BIGINT) AS query_id, sc.doc_id,
       |    CAST(sum(c_micros) AS BIGINT) AS score_micros
       |  FROM sc JOIN qt USING (token)
       |  GROUP BY qt.query_id, sc.doc_id),
       |lex AS (
       |  SELECT query_id, doc_id, rank_lex FROM (
       |    SELECT query_id, doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score_micros DESC, doc_id) AS rank_lex
       |    FROM pq)
       |  WHERE rank_lex <= $FuseDepth),
       |qv AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < ${LexBatch.size}),
       |dn AS (
       |  SELECT qv.query_id, e.vec_id,
       |    list_inner_product(CAST(e.embedding AS DOUBLE[]), qv.qv)
       |      / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
       |                                 CAST(e.embedding AS DOUBLE[])))
       |         * sqrt(list_inner_product(qv.qv, qv.qv))) AS cos_raw
       |  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> qv.query_id),
       |dense AS (
       |  SELECT query_id, doc_id, rank_dense FROM (
       |    SELECT query_id, vec_id AS doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cos_raw DESC, vec_id) AS rank_dense
       |    FROM dn)
       |  WHERE rank_dense <= $FuseDepth),
       |f AS (
       |  SELECT COALESCE(lex.query_id, dense.query_id) AS query_id,
       |    COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
       |    rank_lex, rank_dense,
       |    COALESCE(1000000 // ($RrfK + rank_lex), 0)
       |      + COALESCE(1000000 // ($RrfK + rank_dense), 0) AS rrf_micros
       |  FROM lex FULL OUTER JOIN dense
       |    ON lex.query_id = dense.query_id AND lex.doc_id = dense.doc_id),
       |r AS (
       |  SELECT query_id, doc_id, rank_lex, rank_dense, rrf_micros,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf_micros DESC, doc_id) AS rk
       |  FROM f)
       |SELECT query_id, rk, doc_id, rank_lex, rank_dense, rrf_micros
       |FROM r WHERE rk <= 10
       |ORDER BY query_id, rk""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q(
      "q145_hard_negatives",
      (s, d) => {
        // Hard-negative mining for contrastive/embedding training: for
        // each anchor in a fixed training batch (vec_id < 32 — batch
        // size is a constant, NOT a corpus fraction, so the anchor side
        // is broadcastable at any corpus size), the top-5 most-similar
        // vectors with a DIFFERENT label whose cosine falls in the hard
        // band [NegFloor, NegCeil). SCALE: one corpus scan joined
        // against the broadcast batch (32·n candidate scorings), the
        // band filter prunes before ranking, and the per-anchor top-k
        // window partitions by anchor — 32 independent partition sorts
        // over band survivors only. DETERMINISM: both engines evaluate
        // the same IEEE cosine tree (q29's parity), rank ties break on
        // vec_id, and the displayed cosine rounds to 6dp.
        val emb = embeddings(s, d)
          .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
        // .limit(32) is a no-op on the result (the id filter already
        // admits <= 32 rows) but makes the batch bound STRUCTURAL: the
        // broadcast hint below provably wraps a bounded subtree
        // (ScaleGuardSpec's fence), rather than relying on vec_id being
        // a unique key — which the plan cannot see
        val anchors = emb.filter(col("vec_id") < 32).limit(32)
          .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"),
            col("v").as("av"))
        val byAnchor = Window.partitionBy(col("anchor_id"))
          .orderBy(col("cos_raw").desc, col("vec_id"))
        emb.join(broadcast(anchors), col("label") =!= col("anchor_label"))
          .withColumn("cos_raw", cosine(col("v"), col("av")))
          .filter(col("cos_raw") >= NegFloor && col("cos_raw") < NegCeil)
          .withColumn("rk", row_number().over(byAnchor).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("anchor_id"), col("rk"), col("vec_id").as("neg_id"),
            col("label").as("neg_label"), round(col("cos_raw"), 6).as("cos_sim"))
          .orderBy(col("anchor_id"), col("rk"))
      },
      Some(s"""WITH e AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |a AS (
             |  SELECT vec_id AS anchor_id, label AS anchor_label, v AS av
             |  FROM e WHERE vec_id < 32),
             |sc AS (
             |  SELECT a.anchor_id, e.vec_id AS neg_id, e.label AS neg_label,
             |    list_inner_product(e.v, a.av)
             |      / (sqrt(list_inner_product(e.v, e.v))
             |         * sqrt(list_inner_product(a.av, a.av))) AS cos_raw
             |  FROM e JOIN a ON e.label <> a.anchor_label),
             |b AS (
             |  SELECT anchor_id, neg_id, neg_label, cos_raw,
             |    row_number() OVER (PARTITION BY anchor_id
             |      ORDER BY cos_raw DESC, neg_id) AS rk
             |  FROM sc
             |  WHERE cos_raw >= $NegFloor AND cos_raw < $NegCeil)
             |SELECT anchor_id, rk, neg_id, neg_label,
             |  round(cos_raw, 6) AS cos_sim
             |FROM b WHERE rk <= 5
             |ORDER BY anchor_id, rk""".stripMargin),
      "hard-negative mining for contrastive training: per-anchor (fixed 32-vector batch, broadcast) top-5 different-label neighbors inside the hard cosine band [0.25, 0.95) — band filter before the per-anchor rank window; the denoised-negatives shape of RocketQA/ANCE"),

    Q(
      "q146_rrf_hybrid",
      (s, d) => {
        // Hybrid retrieval by reciprocal-rank fusion (Cormack et al.
        // 2009): fuse the BM25 lexical top-100 (q131's scorer, shared
        // bm25Micros IEEE tree) with the dense cosine top-100 (q29's
        // leg, vec_id 0 as the query embedding; doc_id = vec_id is the
        // corpus alignment) as score = Σ 1/(60 + rank) in exact integer
        // micros (1000000 DIV (60+rank) — no float division anywhere).
        // SCALE: each leg cuts to its top-FuseDepth with a TakeOrdered
        // (no global sort), ranking then runs on a constant-size frame,
        // and the fusion join is bounded at 2·FuseDepth rows whatever
        // the corpus size.
        val docs = documents(s, d)
        val toks = split(col("text"), " ")
        val dl = docs.select(col("doc_id"), size(toks).cast("long").as("dl"))
        val st = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
        val tf = docs
          .select(col("doc_id"), explode(toks).as("token"))
          .filter(col("token").isin(DocQueries.bm25Terms: _*))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        val bm = tf.join(dfc, "token")
          .join(dl, "doc_id")
          .crossJoin(broadcast(st))
          .withColumn("c_micros", expr(DocQueries.bm25Micros))
          .groupBy(col("doc_id"))
          .agg(sum(col("c_micros")).as("score_micros"))
        // single-valued partition key on the post-limit cut (<=
        // FuseDepth rows, bounded) — Similarity.denseRanksStored's
        // warning-free window discipline; pmod ≡ 0 (a foldable lit
        // would be optimized away and the warning would return)
        val lex = bm.orderBy(col("score_micros").desc, col("doc_id"))
          .limit(FuseDepth)
          .withColumn("rank_lex",
            row_number().over(Window.partitionBy(pmod(col("doc_id"), lit(1)))
              .orderBy(col("score_micros").desc, col("doc_id")))
              .cast("long"))
          .select(col("doc_id"), col("rank_lex"))
        rrfFuse(lex, denseRanks(s, d))
      },
      Some(rrfOracleSql),
      "hybrid retrieval: reciprocal-rank fusion (k=60, integer micros — 1000000 DIV (60+rank), no float) of the BM25 lexical top-100 and the dense cosine top-100 — per-leg TakeOrdered cuts, constant-size ranking and fusion join at any corpus size"),

    Q(
      "q152_ann_topk_batch",
      (s, d) => {
        // BATCHED exact retrieval: for every anchor in a fixed training
        // batch (vec_id < 16, structurally bounded — the q145 fence),
        // the top-5 most-cosine-similar other vectors. The brute-force
        // ORACLE baseline of q153's LSH path: one corpus scan against
        // the broadcast batch (16·n scorings), per-anchor rank window
        // over all scored rows. DETERMINISM: shared IEEE cosine tree
        // (q29 parity), rank ties on vec_id, 6dp display rounding.
        val emb = embeddings(s, d)
          .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        val anchors = emb.filter(col("vec_id") < 16).limit(16)
          .select(col("vec_id").as("anchor_id"), col("v").as("av"))
        val byAnchor = Window.partitionBy(col("anchor_id"))
          .orderBy(col("cos_raw").desc, col("vec_id"))
        emb.join(broadcast(anchors), col("vec_id") =!= col("anchor_id"))
          .withColumn("cos_raw", cosine(col("v"), col("av")))
          .withColumn("rk", row_number().over(byAnchor).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("anchor_id"), col("rk"), col("vec_id"),
            round(col("cos_raw"), 6).as("cos_sim"))
          .orderBy(col("anchor_id"), col("rk"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings),
             |a AS (
             |  SELECT vec_id AS anchor_id, v AS av FROM e WHERE vec_id < 16),
             |sc AS (
             |  SELECT a.anchor_id, e.vec_id,
             |    list_inner_product(e.v, a.av)
             |      / (sqrt(list_inner_product(e.v, e.v))
             |         * sqrt(list_inner_product(a.av, a.av))) AS cos_raw
             |  FROM e JOIN a ON e.vec_id <> a.anchor_id),
             |b AS (
             |  SELECT anchor_id, vec_id, cos_raw,
             |    row_number() OVER (PARTITION BY anchor_id
             |      ORDER BY cos_raw DESC, vec_id) AS rk
             |  FROM sc)
             |SELECT anchor_id, rk, vec_id, round(cos_raw, 6) AS cos_sim
             |FROM b WHERE rk <= 5
             |ORDER BY anchor_id, rk""".stripMargin),
      "batched exact top-k retrieval: per-anchor (fixed 16-vector training batch, broadcast) top-5 cosine neighbors over one corpus scan — the brute-force oracle baseline of q153's batched-LSH scale path"),

    Q(
      "q153_ann_topk_batch_lsh",
      (s, d) =>
        // q152's scale path: candidates from the banded LSH index — the
        // corpus is bucketed once (n·tables slim posting rows) and
        // joined against the broadcast batch·tables anchor-bucket index,
        // so the corpus never shuffles for the batch; exact cosine only
        // on same-bucket candidates, per-anchor top-k on true scores.
        // Rows-only (LSH recall is probabilistic); RetrievalSpec pins a
        // recall floor vs q152's exact answer + exact precision, and
        // RecallProbe re-asserts the floor at sf0.1.
        graft.operators.Similarity.annTopKBatch(embeddings(s, d))
          .orderBy(col("anchor_id"), col("rk")),
      None,
      "batched ANN top-k via the LSH bucket index (q152's scale path): per-anchor top-5 from same-bucket candidates — corpus bucketed once, broadcast anchor-bucket join, exact cosine re-score; rows-only, recall floor + exact precision in RetrievalSpec"),

    Q(
      "q158_ann_topk_batch_stored",
      (s, d) =>
        // q153 against the STORED index (build once / query many — the
        // r11-verdict #1 shape): the first call per session builds the
        // bucketed index tables (Similarity.buildAnnIndex); every later
        // call pays only the probe — no LSH recompute, no corpus
        // projection, zero corpus-side exchange (RetrievalSpec pins the
        // plan). Rows-only, but the answer is IDENTICAL to q153's
        // recompute path (same seeded planes, same IEEE cosine) —
        // RetrievalSpec pins row-for-row equality.
        graft.operators.Similarity.annTopKBatchStored(s, StoredIndexes.ann(s, d))
          .orderBy(col("anchor_id"), col("rk")),
      None,
      "batched ANN top-k against the STORED LSH index (build-once/query-many): bucketed postings + vector tables, per-batch cost is the probe only — zero corpus-side exchange; answers row-identical to q153 (RetrievalSpec), rows-only"),

    Q(
      "q161_ann_topk_stored_tombstoned",
      (s, d) =>
        // q158 with a DELETION SET applied (r12 verdict #1): the
        // pipeline's own dedup/decontam decisions drop documents, and a
        // grow-only index kept serving their vectors forever. Here every
        // vec_id ≡ 0 (mod 7) is tombstoned (the deterministic stand-in
        // for a q107/q138 keep-list complement); the probe anti-joins
        // the tombstone table on the vec_id bucket layout BEFORE any
        // ranking, so deleted vectors neither surface as results nor as
        // anchors nor displace live candidates. Rows-only (LSH family);
        // StoredTombstoneSpec pins row-identity with a full rebuild from
        // the surviving corpus, and the streaming half (decision in
        // batch N -> unretrievable in batch N+1) in AnnStreamSpec.
        graft.operators.Similarity.annTopKBatchStored(
          s, StoredIndexes.annTombstoned(s, d))
          .orderBy(col("anchor_id"), col("rk")),
      None,
      "batched ANN top-k against the stored index WITH TOMBSTONES (index deletion, r12 verdict #1): dedup/decontam drop decisions propagate to retrieval via a batch_id-partitioned tombstone table anti-joined before ranking; row-identical to a rebuild from survivors (StoredTombstoneSpec), rows-only"),

    Q(
      "q150_hard_negatives_lsh",
      (s, d) =>
        // q145's scale path: hard negatives for EVERY vector (whole-corpus
        // contrastive mining, where n anchors x n candidates is the
        // all-pairs shape q145's broadcast-batch plan cannot cover) —
        // candidates from the banded LSH index (n·tables slim posting
        // rows, ~linear pair growth under adaptive bucket bits), exact
        // cosine only on same-bucket pairs, label/band re-check exact.
        // Rows-only (LSH recall is probabilistic); RetrievalSpec pins a
        // recall floor against the q145-style exact computation and
        // exact precision on every returned row.
        graft.operators.Similarity.hardNegativesLsh(
          embeddings(s, d), k = 3)
          .orderBy(col("anchor_id"), col("rk")),
      None,
      "corpus-wide hard-negative mining via banded LSH candidates (q145's scale path): per-vector top-3 different-label neighbors in the hard band — linear candidate growth, exact label/band re-check; rows-only, recall floor + exact precision pinned in RetrievalSpec"),

    Q(
      "q169_bm25_topk_stored",
      (s, d) =>
        // q131 against the STORED inverted index (r13 verdict #1 — the
        // lexical leg joins build-once/query-many): the first call per
        // session builds <prefix>_postings/doclen/stats
        // (Lexical.buildLexIndex); every later call pays only the probe —
        // a term-filtered postings scan (|terms| index slices at any
        // corpus size), a |terms|-row df re-count, an O(batches)-row
        // stats sum, no corpus re-tokenization. FULL ORACLE (the q168
        // precedent): every stored column is an exact integer and the
        // score is the one shared bm25Micros IEEE tree, so the probe is
        // bit-identical to q131's recompute — the SQL twin IS q131's.
        graft.operators.Lexical.bm25TopKStored(
          s, StoredIndexes.lex(s, d), DocQueries.bm25Terms),
      Some(DocQueries.bm25OracleSql()),
      "BM25 top-20 against the STORED inverted index (build-once/query-many): token-bucketed postings + doclen + per-batch stats tables under the IndexOps lifecycle; probe cost = the query's own index slices — bit-identical to q131, FULL DuckDB oracle"),

    Q(
      "q170_rrf_hybrid_stored",
      (s, d) =>
        // q146 with its lexical leg served by the stored index: the
        // stored BM25 ranks are bit-identical to the recompute
        // (q169's parity), the dense leg is the SAME shared code as
        // q146 (denseRanks), so the fusion carries q146's full oracle
        // verbatim — the hybrid-retrieval shape a production pipeline
        // runs per query batch, now with neither leg re-deriving
        // corpus-wide state.
        rrfFuse(
          graft.operators.Lexical.bm25RanksStored(
            s, StoredIndexes.lex(s, d), DocQueries.bm25Terms, FuseDepth),
          denseRanks(s, d)),
      Some(rrfOracleSql),
      "reciprocal-rank fusion with the lexical leg from the STORED BM25 index (build-once/query-many) fused against the dense cosine leg — row-identical to q146, FULL DuckDB oracle; per-query cost is the probe, not a corpus re-tokenization"),

    Q(
      "q171_bm25_stored_tombstoned",
      (s, d) =>
        // q169 with a DELETION SET applied (the q161 shape for the
        // lexical family): every doc_id ≡ 0 (mod 7) is tombstoned as
        // deletion batch 0. Unlike the LSH family — where deletion
        // correctness is pinned by rebuild-identity tests — the lexical
        // probe's deletion adjustment is EXACT integer arithmetic
        // (surviving postings shrink df; the stats increments minus the
        // tombstoned docs' doclen rows shrink N and total length), so
        // this is the suite's first stored+tombstoned probe with a FULL
        // DuckDB oracle: the twin simply recomputes BM25 over the
        // surviving documents.
        graft.operators.Lexical.bm25TopKStored(
          s, StoredIndexes.lexTombstoned(s, d), DocQueries.bm25Terms),
      Some(DocQueries.bm25OracleSql(
        "(SELECT * FROM documents WHERE doc_id % 7 <> 0)")),
      "stored BM25 probe WITH TOMBSTONES: drop decisions anti-joined before scoring, df/N/total-length all shrink exactly — bit-identical to a recompute over the surviving corpus, FULL DuckDB oracle (a first for a tombstoned stored probe)"),

    Q(
      "q173_bm25_batch_stored",
      (s, d) =>
        // BATCHED lexical retrieval against the stored index — the
        // q152/q158 training-batch shape for the BM25 leg: per query in
        // a fixed 3-query batch, the top-5 docs. ONE postings scan
        // filtered to the union of the batch's terms feeds every query
        // (df and corpus stats are query-independent, computed once);
        // queries fan out via a broadcast (query_id, token) literal
        // join; per-query ranking partitions by query_id over matched
        // postings only. At 100 TB a step's whole query batch costs the
        // union of its terms' index slices — the corpus is never
        // re-read per query. FULL ORACLE (exact int64 end to end).
        graft.operators.Lexical.bm25BatchTopKStored(
          s, StoredIndexes.lex(s, d), LexBatch),
      Some(lexBatchOracleSql),
      "batched BM25 against the STORED inverted index: 3-query literal batch, one union-of-terms postings scan, per-(doc,term) contributions computed once and fanned out by a broadcast query-terms join, per-query top-5 — FULL DuckDB oracle"),

    Q(
      "q174_rrf_hybrid_both_stored",
      (s, d) =>
        // Hybrid retrieval with BOTH legs served from standing indexes
        // (r14 verdict #1 — the last recompute leg closed): the lexical
        // ranks come from the stored BM25 postings (q169's probe, exact
        // integers) and the dense ranks from the stored ANN index's
        // vector table (Similarity.denseRanksStored — the exact-re-rank
        // vectors q158 already stores, scored with the SAME IEEE cosine
        // tree as q146's recompute, parquet round-tripping the doubles
        // bit-exactly). Each leg is bit-identical to its recompute, so
        // the fusion CARRIES q146's FULL ORACLE VERBATIM — the q169/q170
        // precedent completed: per query batch a production hybrid
        // pipeline now re-derives NOTHING corpus-wide.
        rrfFuse(
          graft.operators.Lexical.bm25RanksStored(
            s, StoredIndexes.lex(s, d), DocQueries.bm25Terms, FuseDepth),
          graft.operators.Similarity.denseRanksStored(
            s, StoredIndexes.ann(s, d), 0L, FuseDepth)),
      Some(rrfOracleSql),
      "reciprocal-rank fusion with BOTH legs stored (build-once/query-many hybrid retrieval): lexical ranks from the stored BM25 postings, dense ranks from the stored ANN index's exact vector table — row-identical to q146, FULL DuckDB oracle; per-query cost is two probes, zero corpus re-derivation"),

    Q(
      "q175_rrf_hybrid_batch_stored",
      (s, d) =>
        // BATCHED fully-stored hybrid retrieval — the actual
        // training/eval step shape (one batch of queries per step,
        // q173's lexical batch fused with the stored dense batch): per
        // query in the fixed 3-query batch (query embeddings = vec_id
        // 0..2, terms = LexBatch), RRF-fuse the stored BM25 ranks with
        // the stored exact dense ranks and keep the per-query top-10.
        // ONE union-of-terms postings scan serves every lexical leg,
        // ONE stored-vector scan against the broadcast anchor batch
        // serves every dense leg, and the fusion joins two <=
        // batch·FuseDepth frames. Exact integers end to end -> FULL
        // ORACLE.
        rrfFuseBatch(
          graft.operators.Lexical.bm25BatchRanksStored(
            s, StoredIndexes.lex(s, d), LexBatch, FuseDepth),
          graft.operators.Similarity.denseRanksBatchStored(
            s, StoredIndexes.ann(s, d), batchSize = LexBatch.size,
            depth = FuseDepth)),
      Some(rrfBatchOracleSql),
      "batched fully-stored hybrid retrieval: per query in a fixed 3-query batch, RRF-fuse the stored-BM25 ranks (one union-of-terms postings scan) with the stored exact dense ranks (one vector-table scan vs the broadcast anchor batch), per-query top-10 — FULL DuckDB oracle"))
}
