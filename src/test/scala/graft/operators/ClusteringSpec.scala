package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.Tables

/** Pins for the k-means family: Lloyd monotonicity, determinism, and the
  * SemDeDup subset/recall relationship against brute-force cosine.
  */
class ClusteringSpec extends AnyFunSuite {

  private lazy val emb = Tables.embeddings(spark, sf0001)

  /** Within-cluster sum of squared euclidean distance for an assignment
    * against a given centroid set (computed driver-side on 500 vectors —
    * test-only measurement code, not a distributed path). Measured under
    * the L2 assignment rule — the rule the training loop itself uses;
    * Lloyd's monotonicity guarantee is for matching assign/update rules.
    */
  private def wcss(cs: Seq[Seq[Double]], prev: Seq[Seq[Double]]): Double = {
    val rows = Clustering.assignL2(emb, prev).select("v", "cluster_id").collect()
    rows.map { r =>
      val v = r.getSeq[Double](0)
      val c = prev(r.getLong(1).toInt)
      v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum
  }

  test("Lloyd iterations never increase within-cluster SS and are deterministic") {
    val c0 = Clustering.centroids(16, 64)
    val (_, c1) = Clustering.kmeans(emb, iters = 1)
    val (_, c2) = Clustering.kmeans(emb, iters = 2)
    val (w0, w1, w2) = (wcss(c0, c0), wcss(c1, c1), wcss(c2, c2))
    assert(w1 <= w0 + 1e-9, s"iter1 $w1 > start $w0")
    assert(w2 <= w1 + 1e-9, s"iter2 $w2 > iter1 $w1")
    // exact-integer update sums -> bit-identical centroids across runs
    val (_, c2again) = Clustering.kmeans(emb, iters = 2)
    assert(c2 == c2again)
  }

  test("update sums account for every vector exactly once") {
    val cs = Clustering.centroids(16, 64)
    val sums = Clustering.updateSums(Clustering.assign(emb, cs))
    val perPos = sums.groupBy("pos").agg(sum("n").as("total")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = emb.count()
    assert(perPos.size == 64 && perPos.values.forall(_ == n))
  }

  test("semantic dedup pairs are a subset of brute-force pairs with identical scores") {
    val cs = Clustering.centroids(16, 64)
    val brute = Similarity.topKPairs(emb, k = 500)
      .filter(col("cos_sim") >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sem = Clustering.semanticDedupPairs(emb, cs, minCos = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(brute.nonEmpty)
    assert(sem.nonEmpty, "no near-dup pair fell inside one cluster at sf0.001")
    sem.foreach { case (pair, cos) =>
      assert(brute.get(pair).contains(cos), s"$pair: $cos vs ${brute.get(pair)}")
    }
  }
}
