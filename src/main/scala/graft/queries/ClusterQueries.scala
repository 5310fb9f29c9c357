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
    s"""WITH v AS (
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
      "SemDeDup-style semantic dedup: exact cosine pairs within a k-means cluster (cluster id prunes the pair space)"))
}
