package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, sf0001}
import graft.queries.Registry

/** q150 (LSH hard-negative mining, rows-only) against the exact
  * computation it approximates: recall floor on the per-anchor exact
  * top-k, exact precision on every returned row.
  */
class RetrievalSpec extends AnyFunSuite {

  private def vdot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def vcos(a: Array[Double], b: Array[Double]): Double =
    vdot(a, b) / (math.sqrt(vdot(a, a)) * math.sqrt(vdot(b, b)))

  test("q150 hard negatives LSH: recall floor vs exact top-3; precision exact") {
    val embs = graft.Tables.embeddings(spark, sf0001).collect().map { r =>
      (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray,
        r.getAs[Int]("label"))
    }
    // exact per-anchor top-3 different-label in-band neighbors (q145's
    // brute shape extended to every anchor)
    val exact: Set[(Long, Long)] = embs.flatMap { case (aid, av, al) =>
      embs.filter(_._3 != al)
        .map { case (nid, nv, _) => (nid, vcos(nv, av)) }
        .filter(c => c._2 >= Similarity.HardNegFloor && c._2 < Similarity.HardNegCeil)
        .sortBy(c => (-c._2, c._1))
        .take(3)
        .map { case (nid, _) => (aid, nid) }
    }.toSet
    assert(exact.nonEmpty, "band must be non-trivial at sf0.001")

    val got = Registry.byName("q150_hard_negatives_lsh").fn(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("anchor_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("neg_id"), r.getAs[Int]("neg_label"),
        r.getAs[Double]("cos_sim")))

    // PRECISION is exact: every returned row re-checks labels and band
    // against driver-recomputed truth, and ranks are 1..k per anchor
    val vecOf = embs.map(e => e._1 -> e._2).toMap
    val lblOf = embs.map(e => e._1 -> e._3).toMap
    got.foreach { case (aid, rk, nid, nl, cs) =>
      assert(lblOf(aid) != nl && lblOf(nid) == nl, s"label mismatch on ($aid,$nid)")
      val c = vcos(vecOf(nid), vecOf(aid))
      assert(c >= Similarity.HardNegFloor && c < Similarity.HardNegCeil,
        s"($aid,$nid) out of band: $c")
      assert(math.abs(cs - c) < 1e-6, s"($aid,$nid) cos $cs vs $c")
      assert(rk >= 1 && rk <= 3)
    }
    got.groupBy(_._1).foreach { case (aid, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, s"ranks of $aid")
    }

    // RECALL floor vs the exact top-3 set (pair-level): the banded index
    // must surface at least half of the true hard negatives at this
    // scale (adaptive bits ~3, 32 tables → near-certain collisions)
    val gotPairs = got.map(r => (r._1, r._3)).toSet
    val recall = exact.count(gotPairs).toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall below floor (|exact|=${exact.size})")

    // determinism: identical output on a second run
    val again = Registry.byName("q150_hard_negatives_lsh").fn(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("anchor_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("neg_id"), r.getAs[Int]("neg_label"),
        r.getAs[Double]("cos_sim")))
    assert(got.toSeq == again.toSeq)
  }

  test("two-stage batched ANN top-k equals the single-window form (nShards=1)") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val sharded = Similarity.annTopKBatch(emb).collect().map(_.toString).sorted.toSeq
    val single = Similarity.annTopKBatch(emb, nShards = 1).collect()
      .map(_.toString).sorted.toSeq
    assert(sharded.nonEmpty && sharded == single)
  }

  test("q158 stored ANN index: row-identical to q153's recompute path, zero corpus-side exchange, reattach survives a catalog wipe") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_idx_spec").toString
    Similarity.buildAnnIndex(emb, "spec_ann", dir)
    val recomputed = Similarity.annTopKBatch(emb).collect()
      .map(_.toString).sorted.toSeq
    val stored = Similarity.annTopKBatchStored(spark, "spec_ann").collect()
      .map(_.toString).sorted.toSeq
    assert(recomputed.nonEmpty && stored == recomputed)
    // the probe plan: bucketed corpus scans (buckets + vecs) reach their
    // joins with no shuffle — per-batch cost is the probe only
    graft.PlanAssert.assertZeroCorpusExchange(
      Similarity.annTopKBatchStored(spark, "spec_ann"), minBucketedScans = 2)
    // restart story
    Seq("spec_ann_buckets", "spec_ann_vecs", "spec_ann_meta")
      .foreach(t => spark.sql(s"DROP TABLE `$t`"))
    Similarity.reattachAnnIndex(spark, "spec_ann", dir)
    val reattached = Similarity.annTopKBatchStored(spark, "spec_ann").collect()
      .map(_.toString).sorted.toSeq
    assert(reattached == recomputed)
    Seq("spec_ann_buckets", "spec_ann_vecs", "spec_ann_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("q174/q175 fully-stored hybrid: the probe plans never scan the corpus parquet; the batched dense leg equals per-query stored probes") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    // the fused probes must read ONLY index tables — the whole point of
    // r14 verdict #1 is that neither leg re-derives corpus-wide state,
    // so a scan rooted under the source testdata dir is a regression
    def corpusScanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        def walk(p: SparkPlan): Seq[FileSourceScanExec] = p match {
          case s: FileSourceScanExec => Seq(s)
          case o => o.children.flatMap(walk)
        }
        walk(df.queryExecution.executedPlan)
          .flatMap(_.relation.location.rootPaths.map(_.toString))
          .filter(_.contains("testdata"))
      } finally spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
    val q174 = Registry.byName("q174_rrf_hybrid_both_stored").fn(spark, sf0001)
    assert(corpusScanPaths(q174).isEmpty,
      s"q174 probe scans the corpus: ${corpusScanPaths(q174)}")
    assert(q174.count() == 20)
    val q175 = Registry.byName("q175_rrf_hybrid_batch_stored").fn(spark, sf0001)
    assert(corpusScanPaths(q175).isEmpty,
      s"q175 probe scans the corpus: ${corpusScanPaths(q175)}")
    // per-query output: every batch query produced a top-10 with dense
    // ranks present (the dense leg always fills depth >= 10)
    val rows175 = q175.collect()
    assert(rows175.length == 30 &&
      rows175.map(_.getLong(0)).distinct.sorted.toSeq == Seq(0L, 1L, 2L))

    // the batched stored dense leg is EXACT: identical to per-query
    // stored probes (same cosine, same rank/tie rules, two-stage cut
    // provably lossless)
    val emb = graft.Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_dr_idx").toString
    Similarity.buildAnnIndex(emb, "spec_dr", dir)
    val batchLeg = Similarity.denseRanksBatchStored(spark, "spec_dr",
      batchSize = 3, depth = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val perQuery = (0L until 3L).flatMap { qid =>
      Similarity.denseRanksStored(spark, "spec_dr", qid, 50).collect()
        .map(r => (qid, r.getLong(0), r.getLong(1)))
    }.toSet
    assert(batchLeg.nonEmpty && batchLeg == perQuery,
      "batched stored dense leg != per-query stored probes")
    Seq("spec_dr_buckets", "spec_dr_vecs", "spec_dr_tombstones", "spec_dr_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("denseRanksStored: an absent or tombstoned query vector is a loud error, not a silently lexical-only fusion (advisor r15)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_dr_err").toString
    Similarity.buildAnnIndex(emb, "spec_drerr", dir)
    val ex = intercept[IllegalArgumentException] {
      Similarity.denseRanksStored(spark, "spec_drerr", queryVecId = 999999999L)
    }
    assert(ex.getMessage.contains("absent"), ex.getMessage)
    IndexOps.tombstone(spark, "spec_drerr", Seq(0L).toDF("vec_id"), 0L)
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.denseRanksStored(spark, "spec_drerr", queryVecId = 0L)
    }
    assert(ex2.getMessage.contains("tombstoned"), ex2.getMessage)
    // present, non-tombstoned queries rank as before — and the bounded
    // post-limit window carries a partition spec, so the probe no
    // longer trips WindowExec's unpartitioned-window warning
    assert(Similarity.denseRanksStored(spark, "spec_drerr", queryVecId = 1L,
      depth = 10).count() == 10)
    Seq("spec_drerr_buckets", "spec_drerr_vecs", "spec_drerr_tombstones",
      "spec_drerr_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("q153 batched ANN: recall floor vs q152's exact per-anchor top-5; precision exact") {
    val embs = graft.Tables.embeddings(spark, sf0001).collect().map { r =>
      (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    }
    val vecOf = embs.map(e => e._1 -> e._2).toMap
    // exact per-anchor top-5 (q152's answer, driver-recomputed)
    val anchors = embs.map(_._1).filter(_ < 16L)
    assert(anchors.length == 16)
    val exact: Set[(Long, Long)] = anchors.flatMap { aid =>
      embs.filter(_._1 != aid)
        .map { case (nid, nv) => (nid, vcos(nv, vecOf(aid))) }
        .sortBy(c => (-c._2, c._1))
        .take(5)
        .map { case (nid, _) => (aid, nid) }
    }.toSet

    val got = Registry.byName("q153_ann_topk_batch_lsh").fn(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("anchor_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim")))

    // PRECISION exact: every row's cosine re-checks against driver truth,
    // self never retrieved, ranks contiguous 1..k per anchor
    got.foreach { case (aid, rk, nid, cs) =>
      assert(nid != aid, s"anchor $aid retrieved itself")
      val c = vcos(vecOf(nid), vecOf(aid))
      assert(math.abs(cs - c) < 1e-6, s"($aid,$nid) cos $cs vs $c")
      assert(rk >= 1 && rk <= 5)
    }
    got.groupBy(_._1).foreach { case (aid, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, s"ranks of $aid")
      // within-anchor order matches the exact cosine order
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"order of $aid")
    }

    // RECALL floor vs the exact top-5 set (32 tables x 6 bits at sf0.001
    // gives near-certain bucket collisions for true neighbors)
    val gotPairs = got.map(r => (r._1, r._3)).toSet
    val recall = exact.count(gotPairs).toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall below floor (|exact|=${exact.size})")

    // determinism: identical output on a second run
    val again = Registry.byName("q153_ann_topk_batch_lsh").fn(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("anchor_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim")))
    assert(got.toSeq == again.toSeq)
  }
}
