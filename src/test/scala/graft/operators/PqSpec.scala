package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.Tables

class PqSpec extends AnyFunSuite {

  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val seeded = Pq.codebooks()

  /** Driver-side reconstruction MSE of an encoding under a codebook set —
    * the quantity Lloyd iterations monotonically reduce.
    */
  private def reconError(cbs: Seq[Seq[Seq[Double]]]): Double = {
    val rows = Pq.encode(emb, cbs)
      .select(col("v") +: (0 until Pq.M).map(m => col(s"code_$m")): _*)
      .collect()
    val errs = rows.map { r =>
      val v = r.getSeq[Double](0)
      (0 until Pq.M).map { m =>
        val c = cbs(m)(r.getLong(m + 1).toInt)
        val sub = v.slice(m * Pq.DSUB, (m + 1) * Pq.DSUB)
        sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum
    }
    errs.sum / errs.length
  }

  test("encode: codes in [0,16), deterministic, and the packed code reconstructs them") {
    val enc = Pq.encode(emb, seeded)
      .select(col("vec_id") +: (0 until Pq.M).map(m => col(s"code_$m")): _*)
      .collect()
    assert(enc.length == emb.count())
    enc.foreach { r =>
      (0 until Pq.M).foreach { m =>
        val c = r.getLong(m + 1)
        assert(c >= 0 && c < Pq.KSUB, s"code_$m=$c out of range")
      }
    }
    val packed = Pq.packedCodes(emb, seeded).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    enc.foreach { r =>
      val expect = (0 until Pq.M).map(m => r.getLong(m + 1) << (4 * m)).sum
      assert(packed(r.getLong(0)) == expect, s"vec ${r.getLong(0)} pack mismatch")
    }
    // deterministic across runs
    val again = Pq.packedCodes(emb, seeded).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == packed)
  }

  test("fit: Lloyd refinement strictly reduces reconstruction error and is deterministic") {
    val fitted = Pq.fit(emb, iters = 2)
    assert(reconError(fitted) < reconError(seeded),
      "2 Lloyd iterations must reduce quantization MSE")
    val fitted2 = Pq.fit(emb, iters = 2)
    assert(fitted == fitted2, "fit must be deterministic")
  }

  test("ADC top-k: recall vs the exact inner-product top-10 clears the floor") {
    // ADC approximates the INNER PRODUCT (query · reconstruction), so the
    // recall baseline is the exact inner-product top-10, not cosine.
    import graft.functions.VectorFunctions._
    val qv = emb.filter(col("vec_id") === 0L)
      .select(asDouble(col("embedding")).as("qv"))
    val exact = emb.filter(col("vec_id") =!= 0L)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .join(broadcast(qv))
      .withColumn("ip", dot(col("v"), col("qv")))
      .orderBy(col("ip").desc, col("vec_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    val adc = Pq.adcTopK(emb, Pq.fit(emb, iters = 2), queryVecId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(adc.size == 10)
    assert(!adc.contains(0L))
    val recall = (adc intersect exact).size / 10.0
    assert(recall >= 0.4, s"ADC recall too low: $recall") // 4-bit codes + exact re-rank
  }

  test("batched ADC top-k (q157): pair-level recall floor vs exact per-anchor IP top-5; ranks/precision sane") {
    import graft.functions.VectorFunctions._
    val got = Pq.adcTopKBatch(emb, Pq.fit(emb, iters = 2)).collect()
      .map(r => (r.getAs[Long]("anchor_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
    // structure: <=5 contiguous ranks per anchor, no self-retrieval
    got.groupBy(_._1).foreach { case (aid, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, s"ranks of $aid")
      assert(!rs.map(_._3).contains(aid), s"anchor $aid retrieved itself")
    }
    // exact per-anchor inner-product top-5 (driver-side truth)
    val embs = emb.collect().map { r =>
      (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    }
    def ip(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val vecOf = embs.toMap
    val exact = embs.map(_._1).filter(_ < 16L).flatMap { aid =>
      embs.filter(_._1 != aid)
        .map { case (nid, nv) => (nid, ip(nv, vecOf(aid))) }
        .sortBy(c => (-c._2, c._1)).take(5)
        .map { case (nid, _) => (aid, nid) }
    }.toSet
    // re-ranked scores are EXACT inner products
    got.foreach { case (aid, _, nid, sc) =>
      assert(math.abs(sc - ip(vecOf(nid), vecOf(aid))) < 1e-6, s"($aid,$nid) score")
    }
    val gotPairs = got.map(r => (r._1, r._3)).toSet
    val recall = exact.count(gotPairs).toDouble / exact.size
    assert(recall >= 0.5, s"batched ADC recall $recall below floor")
  }

  test("ADC LUT scoring is bit-identical to the naive per-row dot formulation") {
    import graft.functions.VectorFunctions._
    // fitted (non-seeded) codebooks so the parity claim covers the
    // data-dependent values the real queries ship
    val cbs = Pq.fit(emb, iters = 1)
    val enc = Pq.encode(emb, cbs)
      .select(col("vec_id") +: (0 until Pq.M).map(m => col(s"code_$m")): _*)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(asDouble(col("embedding")).as("qv"))
    val naive = enc.join(broadcast(qv))
      .withColumn("s", Pq.adcSum(cbs))
      .select(col("vec_id"), col("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lut = enc.join(broadcast(Pq.withAdcLut(qv, col("qv"), cbs)))
      .withColumn("s", Pq.lutAdcSum)
      .select(col("vec_id"), col("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lut.keySet == naive.keySet)
    // BIT identity (==, no tolerance): each LUT entry is the same dot
    // expression the naive form evaluates per row, folded in the same
    // order — any drift here would silently change candidate sets
    lut.foreach { case (id, s) =>
      assert(s == naive(id), s"vec $id: lut $s != naive ${naive(id)}")
    }
  }

  test("two-stage batched top-k equals the single-window form (nShards=1)") {
    val cbs = Pq.fit(emb, iters = 2)
    val sharded = Pq.adcTopKBatch(emb, cbs).collect().map(_.toString).sorted.toSeq
    val single = Pq.adcTopKBatch(emb, cbs, nShards = 1).collect()
      .map(_.toString).sorted.toSeq
    assert(sharded.nonEmpty && sharded == single)
  }

  test("stored PQ index: row-identical to recompute, zero corpus-side exchange, reattach survives a catalog wipe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_idx_spec").toString
    val cbs = Pq.buildPqIndex(emb, "spec_pq", dir, iters = 2)
    // codebooks round-trip parquet bit-exactly — the premise of the
    // row-identity claim
    assert(Pq.pqIndexCodebooks(spark, "spec_pq") == cbs)
    val recomputed = Pq.adcTopKBatch(emb, cbs).collect().map(_.toString).sorted.toSeq
    val stored = Pq.adcTopKBatchStored(spark, "spec_pq").collect()
      .map(_.toString).sorted.toSeq
    assert(recomputed.nonEmpty && stored == recomputed)
    // the probe plan: bucketed corpus scans (codes + vecs) reach their
    // joins with no shuffle — the build-once/query-many promise
    graft.PlanAssert.assertZeroCorpusExchange(
      Pq.adcTopKBatchStored(spark, "spec_pq"), minBucketedScans = 2)
    // restart story: catalog entries die with the session, files survive
    Seq("spec_pq_codes", "spec_pq_vecs", "spec_pq_meta")
      .foreach(t => spark.sql(s"DROP TABLE `$t`"))
    Pq.reattachPqIndex(spark, "spec_pq", dir)
    val reattached = Pq.adcTopKBatchStored(spark, "spec_pq").collect()
      .map(_.toString).sorted.toSeq
    assert(reattached == recomputed)
    Seq("spec_pq_codes", "spec_pq_vecs", "spec_pq_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("two-stage ADC cut partitions stage 1 on (anchor, shard): fan-out beyond batch size") {
    val plan = Pq.adcTopKBatch(emb, seeded, nShards = 8)
      .queryExecution.executedPlan.toString
    assert("""hashpartitioning\(anchor_id#\d+L?, shard#""".r.findFirstIn(plan).isDefined,
      s"stage-1 exchange not keyed on (anchor_id, shard):\n${plan.take(3000)}")
  }

  test("stored IVF-PQ index (q160): row-identical to q123's recompute, zero corpus-side exchange, reattach") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx_spec").toString
    Pq.buildIvfPqIndex(emb, "spec_ivfpq", dir)
    // q123's recompute path, same fits (deterministic)
    val coarse = Clustering.fitCentroids(emb, 16, 64, iters = 2, seed = 7L)
    val cbs = Pq.fitOn(Pq.residuals(emb, coarse), iters = 2)
    val recomputed = Pq.ivfPqTopK(emb, coarse, cbs, queryVecId = 0L, k = 10, nProbe = 8)
      .collect().map(_.toString).sorted.toSeq
    val stored = Pq.ivfPqTopKStored(spark, "spec_ivfpq", queryVecId = 0L,
      k = 10, nProbe = 8).collect().map(_.toString).sorted.toSeq
    assert(recomputed.nonEmpty && stored == recomputed)
    // stored meta round-trips both fits bit-exactly
    val (coarseBack, cbsBack) = Pq.ivfPqIndexMeta(spark, "spec_ivfpq")
    assert(coarseBack == coarse && cbsBack == cbs)
    graft.PlanAssert.assertZeroCorpusExchange(
      Pq.ivfPqTopKStored(spark, "spec_ivfpq", queryVecId = 0L, k = 10, nProbe = 8),
      minBucketedScans = 2)
    Seq("spec_ivfpq_codes", "spec_ivfpq_vecs", "spec_ivfpq_meta")
      .foreach(t => spark.sql(s"DROP TABLE `$t`"))
    Pq.reattachIvfPqIndex(spark, "spec_ivfpq", dir)
    val reattached = Pq.ivfPqTopKStored(spark, "spec_ivfpq", queryVecId = 0L,
      k = 10, nProbe = 8).collect().map(_.toString).sorted.toSeq
    assert(reattached == recomputed)
    Seq("spec_ivfpq_codes", "spec_ivfpq_vecs", "spec_ivfpq_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("batched stored IVF-PQ (q177): per-anchor row-identical to q160's single-query probe; shard count cannot change rows") {
    // nProbe = 8 here and in the q160 test above — the SHIPPED
    // q160/q177 setting (advisor r15: identity is structurally
    // parameter-independent, but the pinned configuration must be the
    // production one)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpqb_idx").toString
    Pq.buildIvfPqIndex(emb, "spec_ivfpqb", dir)
    val batch = Pq.ivfPqTopKBatchStored(spark, "spec_ivfpqb",
      batchSize = 16, k = 5, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(batch.nonEmpty)
    // identity with 16 independent single-query stored probes: same
    // listScores probe sets, same LUT trees, same tie rules — the ONE
    // union-of-lists scan cannot change a row
    val perQuery = (0L until 16L).flatMap { qid =>
      Pq.ivfPqTopKStored(spark, "spec_ivfpqb", queryVecId = qid,
        k = 5, nProbe = 8).collect().zipWithIndex
        .map { case (r, i) => (qid, (i + 1).toLong, r.getLong(0), r.getInt(1),
          r.getDouble(2), r.getDouble(3)) }
    }.toSet
    assert(batch == perQuery, "batched stored probe != per-query stored probes")
    // the two-stage cut is shard-count-invariant (the determinism sweep
    // crosses CPU counts, so this must hold by construction)
    val oneShard = Pq.ivfPqTopKBatchStored(spark, "spec_ivfpqb",
      batchSize = 16, k = 5, nProbe = 8, nShards = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(oneShard == batch)
    Seq("spec_ivfpqb_codes", "spec_ivfpqb_vecs", "spec_ivfpqb_tombstones",
      "spec_ivfpqb_monitor", "spec_ivfpqb_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("IVF-PQ: probed subset only, and residual coding clears the recall floor") {
    import graft.functions.VectorFunctions._
    // the LEARNED coarse quantizer q123 ships (2 exact Lloyd iterations),
    // fit ONCE and reused across the 5 probe queries (index/query split)
    val coarse = Clustering.fitCentroids(emb, 16, 64, iters = 2, seed = 7L)
    val cbs = Pq.fitOn(Pq.residuals(emb, coarse), iters = 2)
    // 5-query MEAN recall vs exact inner-product top-10 (RecallProbe's
    // methodology — one query is too coarse a sample for a 10-set floor)
    val recalls = Seq(0L, 1L, 2L, 3L, 4L).map { qid =>
      val got = Pq.ivfPqTopK(emb, coarse, cbs, queryVecId = qid, k = 10, nProbe = 6)
        .collect()
      assert(got.length == 10)
      assert(!got.map(_.getLong(0)).contains(qid))
      // results only come from probed lists (<= nProbe distinct list ids)
      assert(got.map(_.getInt(1)).distinct.length <= 6)
      val qv = emb.filter(col("vec_id") === qid)
        .select(asDouble(col("embedding")).as("qv"))
      val exact = emb.filter(col("vec_id") =!= qid)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .join(broadcast(qv))
        .withColumn("ip", dot(col("v"), col("qv")))
        .orderBy(col("ip").desc, col("vec_id"))
        .limit(10).collect().map(_.getLong(0)).toSet
      (got.map(_.getLong(0)).toSet intersect exact).size / 10.0
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.5, s"IVF-PQ mean recall too low: $recall ($recalls)")
  }
}
