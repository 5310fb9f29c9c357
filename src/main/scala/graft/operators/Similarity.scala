package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  * Brute-force cosine (queries.VectorQueries q29) is the correctness
  * baseline; this module adds the scale paths:
  *
  *  - top-k *pairs* across the corpus (embedding near-dup detection);
  *  - random-hyperplane LSH ANN: L hash tables × nb sign-bits each. Planes
  *    are generated driver-side from a fixed seed (tiny: L·nb·dim doubles,
  *    broadcast as literals — no data collect), bucket keys are computed
  *    executor-side, and only same-bucket candidates get exact cosine.
  *
  * 100 TB notes: brute-force pair search is O(n²·dim) and exists only as
  * the oracle baseline; LSH turns the corpus scan into a shuffle on
  * (table, bucket) keys — n·L tiny rows — and exact scoring touches only
  * candidates. Bucket skew (dense regions) is the known failure mode: AQE
  * skew-join split plus raising nb bounds bucket population.
  */
object Similarity {

  /** Top-k most-similar pairs by cosine, brute force (baseline/oracle). */
  def topKPairs(emb: DataFrame, k: Int = 20): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val a = e.toDF("vec_a", "va")
    val b = e.toDF("vec_b", "vb")
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos_raw", cosine(col("va"), col("vb")))
      .orderBy(col("cos_raw").desc, col("vec_a"), col("vec_b"))
      .limit(k)
      .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 6).as("cos_sim"))
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed). */
  private def planes(tables: Int, bits: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    val rnd = new java.util.Random(42L)
    Seq.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** Attach (table, bucket) LSH keys: bucket bit j of table t is the sign
    * of <v, plane_tj>.
    */
  def withLshBuckets(emb: DataFrame, tables: Int = 32, bits: Int = 6,
      dim: Int = 64): DataFrame = {
    val ps = planes(tables, bits, dim)
    val keyCols = ps.zipWithIndex.map { case (tablePlanes, t) =>
      val bucket = tablePlanes.zipWithIndex.map { case (p, j) =>
        when(dot(col("v"), typedlit(p)) > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(t).as("table"), bucket.as("bucket"))
    }
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bk", explode(array(keyCols: _*)))
      .select(col("vec_id"), col("v"), col("bk.table").as("table"), col("bk.bucket").as("bucket"))
  }

  /** ANN top-k for one query vector: union of same-bucket candidates over L
    * tables, then exact cosine on candidates only.
    */
  def annTopK(emb: DataFrame, queryVecId: Long, k: Int = 10,
      tables: Int = 32, bits: Int = 6): DataFrame = {
    val bucketed = withLshBuckets(emb, tables, bits)
    val queryBuckets = bucketed.filter(col("vec_id") === queryVecId)
      .select(col("table").as("q_table"), col("bucket").as("q_bucket"),
        col("v").as("qv"))
    bucketed.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(queryBuckets),
        col("table") === col("q_table") && col("bucket") === col("q_bucket"))
      .select(col("vec_id"), col("v"), col("qv")).distinct()
      .withColumn("cos_raw", cosine(col("v"), col("qv")))
      .orderBy(col("cos_raw").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos_raw"), 6).as("cos_sim"))
  }
}
