package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  * Brute-force cosine is the oracle-checkable baseline; the LSH-bucketed
  * scale path lives in `graft.operators.Similarity` (rows-only check — not
  * SQL-expressible in DuckDB).
  */
object VectorQueries {

  val all: Seq[Q] = Seq(
    Q(
      "q28_embedding_norms",
      (s, d) =>
        embeddings(s, d)
          .select(
            col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            round(l2Norm(asDouble(col("embedding"))), 6).as("l2_norm"))
          .orderBy(col("vec_id")),
      Some("""SELECT vec_id, len(embedding) AS dim,
             |  round(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
             |                                CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
             |FROM embeddings
             |ORDER BY vec_id""".stripMargin),
      "per-vector L2 norm — validates the double-fold parity with DuckDB"),

    Q(
      "q65_array_ops",
      (s, d) =>
        embeddings(s, d)
          .select(
            col("vec_id"),
            element_at(slice(col("embedding"), 1, 3), 1).as("e1"),
            element_at(slice(col("embedding"), 1, 3), 3).as("e3"),
            array_max(col("embedding")).as("max_elem"),
            array_min(col("embedding")).as("min_elem"),
            size(filter(col("embedding"), x => x > 0)).cast("long").as("n_positive"),
            element_at(col("embedding"), -1).as("last_elem"))
          .orderBy(col("vec_id")),
      Some("""SELECT vec_id,
             |  embedding[1:3][1] AS e1,
             |  embedding[1:3][3] AS e3,
             |  list_max(embedding) AS max_elem,
             |  list_min(embedding) AS min_elem,
             |  len(list_filter(embedding, x -> x > 0)) AS n_positive,
             |  embedding[-1] AS last_elem
             |FROM embeddings
             |ORDER BY vec_id""".stripMargin),
      "array function family: slice/element_at/min/max/filter/negative-index over float vectors " +
        "(no arithmetic → exact parity; scalar outputs so the hash compare never sees array cells)"),

    Q(
      "q29_cosine_topk",
      (s, d) => {
        val emb = embeddings(s, d)
          .select(col("vec_id"), asDouble(col("embedding")).as("e"))
        val query = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
        emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(query))
          .withColumn("cos_raw", cosine(col("e"), col("qe")))
          .orderBy(col("cos_raw").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), round(col("cos_raw"), 6).as("cos_sim"))
      },
      Some("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
             |scored AS (
             |  SELECT vec_id,
             |    list_inner_product(CAST(embedding AS DOUBLE[]), qe)
             |      / (sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
             |         * sqrt(list_inner_product(qe, qe))) AS cos_raw
             |  FROM embeddings, q
             |  WHERE vec_id <> 0)
             |SELECT vec_id, round(cos_raw, 6) AS cos_sim
             |FROM scored
             |ORDER BY cos_raw DESC, vec_id
             |LIMIT 10""".stripMargin),
      "brute-force cosine top-k vs query vector (broadcast of the 1-row query side)"))
}
