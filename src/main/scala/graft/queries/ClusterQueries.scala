package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.Clustering

/** K-means clustering family over `embeddings` (q84–q86): cluster
  * assignment, the exact-integer centroid-update sums, and SemDeDup-style
  * within-cluster semantic dedup.
  *
  * Every DuckDB twin REPLAYS the full computation — the seeded centroids
  * are embedded as double literals generated from the SAME
  * `Clustering.centroids` values (`Double.toString` round-trips, so both
  * engines parse the identical IEEE double), and the dot products are
  * `list_inner_product` vs the codegen'd VecDot, proven bit-identical by
  * q28/q29. Assignment argmax uses `row_number ORDER BY s DESC, c ASC` in
  * SQL vs a (score, -c) struct sort in Spark: same pick on bit-equal
  * scores, ties to the lowest cluster id.
  */
object ClusterQueries {

  private val K = 16
  private val DIM = 64
  private val cs = Clustering.centroids(K, DIM)

  /** Shared DuckDB CTE block: vectors as DOUBLE[], centroid literals,
    * per-(vec, centroid) scores, and the argmax assignment.
    */
  private val assignCte: String = {
    val cents = cs.zipWithIndex.map { case (v, c) =>
      s"($c, CAST([${v.map(_.toString).mkString(", ")}] AS DOUBLE[]))"
    }.mkString(",\n    ")
    // RECURSIVE scopes the whole WITH list (q88's closure needs it; the
    // other consumers ignore it harmlessly)
    s"""WITH RECURSIVE v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent(c, ctr) AS (VALUES
       |    $cents),
       |sc AS (
       |  SELECT vec_id, c, list_inner_product(v.v, cent.ctr) AS s
       |  FROM v CROSS JOIN cent),
       |asg AS (
       |  SELECT vec_id, c AS cluster_id FROM (
       |    SELECT vec_id, c,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
       |    FROM sc)
       |  WHERE rn = 1)""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q(
      "q84_emb_cluster_assign",
      (s, d) =>
        Clustering.assign(embeddings(s, d), cs)
          .select(col("vec_id"), col("cluster_id"))
          .orderBy(col("vec_id")),
      Some(s"""$assignCte
             |SELECT vec_id, cluster_id FROM asg ORDER BY vec_id""".stripMargin),
      "k-means cluster assignment (argmax of 16 centroid dot products, deterministic seeded centroids)"),

    Q(
      "q85_emb_cluster_update",
      (s, d) =>
        Clustering.updateSums(Clustering.assign(embeddings(s, d), cs))
          .orderBy(col("cluster_id"), col("pos")),
      Some(s"""$assignCte,
             |cells AS (
             |  SELECT a.cluster_id, i.i AS pos,
             |    CAST(floor(v.v[i.i + 1] * ${Clustering.FixedPointUnit}) AS BIGINT) AS fx
             |  FROM asg a, v, (SELECT unnest(range(0, $DIM)) AS i) i
             |  WHERE a.vec_id = v.vec_id)
             |SELECT cluster_id, pos,
             |  CAST(sum(fx) AS BIGINT) AS sum_fx, count(*) AS n
             |FROM cells
             |GROUP BY cluster_id, pos
             |ORDER BY cluster_id, pos""".stripMargin),
      "k-means centroid-update sums: exact int64 fixed-point (2^-30) units per (cluster, dim) — " +
        "binary scaling so floor() is bit-portable, unlike a decimal cast"),

    Q(
      "q86_emb_semantic_dedup",
      (s, d) =>
        Clustering.semanticDedupPairs(embeddings(s, d), cs, minCos = 0.35)
          .orderBy(col("vec_a"), col("vec_b")),
      Some(s"""$assignCte
             |SELECT vec_a, vec_b, cluster_id, round(cos_raw, 6) AS cos_sim
             |FROM (
             |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cluster_id,
             |    list_inner_product(av.v, bv.v)
             |      / (sqrt(list_inner_product(av.v, av.v))
             |         * sqrt(list_inner_product(bv.v, bv.v))) AS cos_raw
             |  FROM asg a
             |  JOIN asg b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
             |  JOIN v av ON av.vec_id = a.vec_id
             |  JOIN v bv ON bv.vec_id = b.vec_id)
             |WHERE cos_raw >= 0.35
             |ORDER BY vec_a, vec_b""".stripMargin),
      "SemDeDup-style semantic dedup: exact cosine pairs within a k-means cluster (cluster id prunes the pair space)"),

    Q(
      "q88_semantic_dedup_decisions",
      (s, d) =>
        graft.operators.Dedup.connectedComponents(
          Clustering.semanticDedupPairs(embeddings(s, d), cs, minCos = 0.35)
            .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
          .select(col("doc_id").as("vec_id"), col("component"),
            (col("doc_id") === col("component")).cast("long").as("keep"))
          .orderBy(col("vec_id")),
      Some(s"""$assignCte,
             |sem_pairs AS MATERIALIZED (
             |  SELECT vec_a, vec_b FROM (
             |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |      list_inner_product(av.v, bv.v)
             |        / (sqrt(list_inner_product(av.v, av.v))
             |           * sqrt(list_inner_product(bv.v, bv.v))) AS cos_raw
             |    FROM asg a
             |    JOIN asg b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
             |    JOIN v av ON av.vec_id = a.vec_id
             |    JOIN v bv ON bv.vec_id = b.vec_id)
             |  WHERE cos_raw >= 0.35),
             |edges AS (
             |  SELECT vec_a AS u, vec_b AS w FROM sem_pairs
             |  UNION
             |  SELECT vec_b, vec_a FROM sem_pairs),
             |reach(n, m) AS (
             |  SELECT u, u FROM edges
             |  UNION
             |  SELECT r.n, e.w FROM reach r JOIN edges e ON r.m = e.u)
             |SELECT n AS vec_id, min(m) AS component,
             |  CAST(n = min(m) AS BIGINT) AS keep
             |FROM reach
             |GROUP BY n
             |ORDER BY vec_id""".stripMargin),
      "semantic dedup DECISIONS: connected components over within-cluster cosine pairs — keep = lowest vec_id per semantic group (SemDeDup end-to-end)"),

    Q(
      "q107_union_dedup_decisions",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // Production dedup decision table from the UNION of duplicate
        // signals: text near-dup pairs (exact 3-gram Jaccard >= 0.8, q30's
        // operator) and semantic near-dup pairs (within-cluster cosine >=
        // 0.35, q86's operator, vec_id == doc_id in this corpus), closed
        // into ONE set of components. The kept representative follows the
        // production convention (RefinedWeb-style): LONGEST text wins,
        // ties to the lowest doc_id — unlike q87/q88's min-id policy.
        // SCALE: both pair generators are the bucketed shapes already
        // graded (inverted index / cluster-pruned pair space); the union
        // adds one distinct over edge rows; components cost is the q87
        // iterative machinery over the merged (still component-sized)
        // edge set; the final window partitions by component id.
        val textPairs = graft.operators.Dedup
          .shingleJaccardPairs(documents(s, d), threshold = 0.8)
          .select(col("doc_a"), col("doc_b"))
        val semPairs = Clustering.semanticDedupPairs(embeddings(s, d), cs, minCos = 0.35)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
        val comps = graft.operators.Dedup.connectedComponents(
          textPairs.union(semPairs))
        val quality = documents(s, d)
          .select(col("doc_id"), length(col("text")).cast("long").as("n_chars_doc"))
        val wk = Window.partitionBy(col("component"))
          .orderBy(col("n_chars_doc").desc, col("doc_id"))
        comps.join(quality, Seq("doc_id"))
          .withColumn("keep", (row_number().over(wk) === 1).cast("long"))
          .select(col("doc_id"), col("component"), col("n_chars_doc"), col("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""$assignCte,
             |${LlmQueries.jaccardPairsBody},
             |sem_pairs AS MATERIALIZED (
             |  SELECT vec_a, vec_b FROM (
             |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |      list_inner_product(av.v, bv.v)
             |        / (sqrt(list_inner_product(av.v, av.v))
             |           * sqrt(list_inner_product(bv.v, bv.v))) AS cos_raw
             |    FROM asg a
             |    JOIN asg b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
             |    JOIN v av ON av.vec_id = a.vec_id
             |    JOIN v bv ON bv.vec_id = b.vec_id)
             |  WHERE cos_raw >= 0.35),
             |edges AS (
             |  SELECT doc_a AS u, doc_b AS w FROM pairs WHERE j >= 0.8
             |  UNION SELECT doc_b, doc_a FROM pairs WHERE j >= 0.8
             |  UNION SELECT vec_a, vec_b FROM sem_pairs
             |  UNION SELECT vec_b, vec_a FROM sem_pairs),
             |reach(n, m) AS (
             |  SELECT u, u FROM edges
             |  UNION
             |  SELECT r.n, e.w FROM reach r JOIN edges e ON r.m = e.u),
             |comp AS (SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n)
             |SELECT c.doc_id, c.component, length(d.text) AS n_chars_doc,
             |  CAST(row_number() OVER (PARTITION BY c.component
             |    ORDER BY length(d.text) DESC, c.doc_id) = 1 AS BIGINT) AS keep
             |FROM comp c JOIN documents d ON c.doc_id = d.doc_id
             |ORDER BY c.doc_id""".stripMargin),
      "union-of-signals dedup decisions: text-Jaccard ∪ semantic-cosine edges → one component set; keep = longest text (production policy), ties to lowest doc_id"),

    Q(
      "q178_semantic_dedup_stored",
      (s, d) =>
        // INCREMENTAL semantic dedup against the STORED cluster index
        // (r14 verdict #5 — the q86/q88 family joins build-once/
        // query-many): the standing index froze the seeded centroids
        // and holds the cluster-bucketed members (vec_id >= 100); the
        // screen decides the incoming vec_id < 100 batch by assigning
        // it (batch-only projection, frozen centroid literals) and
        // exact-cosining against ITS clusters' members — the corpus is
        // never re-assigned or re-paired against itself. FULL ORACLE:
        // assignment is q84's replayed tree, the cosine is q86's, the
        // winner is an integer min — DuckDB recomputes the decisions
        // from raw rows.
        graft.operators.SemDedup.screenSem(s,
          incoming = embeddings(s, d).filter(col("vec_id") < 100),
          tablePrefix = StoredIndexes.sem(s, d))
          .orderBy(col("vec_id")),
      Some(s"""$assignCte,
             |corp AS (
             |  SELECT a.vec_id AS corp_id, a.cluster_id, v.v AS cv
             |  FROM asg a JOIN v ON v.vec_id = a.vec_id
             |  WHERE a.vec_id >= 100),
             |inc AS (
             |  SELECT a.vec_id, a.cluster_id, v.v
             |  FROM asg a JOIN v ON v.vec_id = a.vec_id
             |  WHERE a.vec_id < 100),
             |near AS (
             |  SELECT inc.vec_id, min(corp.corp_id) AS sem_dup_of
             |  FROM inc JOIN corp ON inc.cluster_id = corp.cluster_id
             |  WHERE list_inner_product(inc.v, corp.cv)
             |        / (sqrt(list_inner_product(inc.v, inc.v))
             |           * sqrt(list_inner_product(corp.cv, corp.cv))) >= 0.35
             |  GROUP BY inc.vec_id)
             |SELECT inc.vec_id, CAST(inc.cluster_id AS BIGINT) AS cluster_id,
             |  near.sem_dup_of,
             |  CAST(near.sem_dup_of IS NULL AS BIGINT) AS keep
             |FROM inc LEFT JOIN near ON inc.vec_id = near.vec_id
             |ORDER BY inc.vec_id""".stripMargin),
      "incremental semantic dedup against the STORED cluster index (frozen seeded centroids, cluster-bucketed members): the incoming batch assigns itself and exact-cosines only its clusters' members — O(batch·k + batch·cluster-mates), corpus never re-assigned; FULL DuckDB oracle"))
}
