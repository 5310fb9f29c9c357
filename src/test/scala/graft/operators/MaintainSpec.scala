package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.streaming.{AnnStream, LexStream, SemDedupStream}
import java.nio.file.Files

/** The maintenance loop, closed (r15 verdict #1): `IndexOps.maintain`
  * must read the family's policy decision, EXECUTE the decided rewrite,
  * and verify the follow-up policy is healthy — one test per registered
  * family driving the state that trips its decision, plus the healthy
  * no-op and the error contracts. The rewrites themselves are pinned by
  * their own family specs; these tests pin the DISPATCH: the right
  * operator ran, the signal was consumed, the trail says so.
  */
class MaintainSpec extends AnyFunSuite {

  private lazy val emb = graft.Tables.embeddings(spark, sf0001)
    .select(col("vec_id"), col("embedding"))
  private lazy val docs = graft.Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text"))

  private def dropAll(prefix: String, tables: Seq[String]): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))

  private def trail(df: org.apache.spark.sql.DataFrame): Map[String, (String, String)] =
    df.collect().map(r => r.getAs[String]("phase") ->
      ((r.getAs[String]("decision"), r.getAs[String]("triggered_by")))).toMap

  test("maintain/sq8: drift -> refit executed -> healthy (monitor consumed, fresh baseline)") {
    val base = Files.createTempDirectory("mnt_sq8")
    Sq8.buildSq8Index(emb.filter(col("vec_id") >= 100), "mnt_sq8", s"$base/idx")
    val mseBefore = spark.table("mnt_sq8_meta")
      .select(col("mse_micros")).collect()(0).getLong(0)
    // drifted batch: +2 per dim clamps far past the frozen range
    AnnStream.indexBatchSq8(spark, emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 50000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(2.0f)).as("embedding")),
      0L, "mnt_sq8")
    val t = trail(IndexOps.maintain(spark, "mnt_sq8", "sq8", s"$base/idx"))
    assert(t("decided") == (("refit", "monitor_alert")), t.toString)
    assert(t("after") == (("healthy", "none")), t.toString)
    // the refit actually ran: one folded generation, fresh build MSE
    // (the drifted rows are now IN the fitted range), fences advanced
    assert(IndexOps.batchIdsOf(spark, "mnt_sq8_codes").size == 1)
    assert(IndexOps.compactedThrough(spark, "mnt_sq8") == 0L)
    assert(spark.table("mnt_sq8_meta")
      .select(col("mse_micros")).collect()(0).getLong(0) != mseBefore)
    dropAll("mnt_sq8", Seq("codes", "vecs", "tombstones", "monitor", "meta"))
  }

  test("maintain/pq: tombstones past the bar -> compact executed -> healthy (deletions purged)") {
    val base = Files.createTempDirectory("mnt_pq")
    Pq.buildPqIndex(emb, "mnt_pq", s"$base/idx", iters = 2)
    IndexOps.tombstone(spark, "mnt_pq",
      emb.filter(pmod(col("vec_id"), lit(3)) === 0).select(col("vec_id")), 0L)
    val t = trail(IndexOps.maintain(spark, "mnt_pq", "pq", s"$base/idx"))
    assert(t("decided") == (("compact", "tombstone_ppm")), t.toString)
    assert(t("after") == (("healthy", "none")), t.toString)
    assert(spark.table("mnt_pq_tombstones").count() == 0)
    assert(spark.table("mnt_pq_vecs")
      .filter(pmod(col("vec_id"), lit(3)) === 0).count() == 0,
      "tombstoned rows survived the maintain-dispatched compaction")
    dropAll("mnt_pq", Seq("codes", "vecs", "tombstones", "monitor", "meta"))
  }

  test("maintain/ivf_pq: un-folded batch count past the bar -> compact executed -> healthy") {
    val base = Files.createTempDirectory("mnt_ivfpq")
    Pq.buildIvfPqIndex(emb.filter(col("vec_id") >= 100), "mnt_ivfpq", s"$base/idx")
    (0 to 4).foreach { b =>
      AnnStream.indexBatchIvfPq(spark, emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + b * 100000L).as("vec_id"), col("embedding")),
        b.toLong, "mnt_ivfpq")
    }
    val t = trail(IndexOps.maintain(spark, "mnt_ivfpq", "ivf_pq", s"$base/idx"))
    assert(t("decided") == (("compact", "batch_count")), t.toString)
    assert(t("after") == (("healthy", "none")), t.toString)
    assert(IndexOps.batchIdsOf(spark, "mnt_ivfpq_codes").size == 1)
    dropAll("mnt_ivfpq", Seq("codes", "vecs", "tombstones", "monitor", "meta"))
  }

  test("maintain/ann_lsh: healthy no-op touches nothing; a deletion past a lowered bar compacts and the probe stops serving it") {
    val base = Files.createTempDirectory("mnt_ann")
    Similarity.buildAnnIndex(emb, "mnt_ann", s"$base/idx")
    val filesBefore = spark.table("mnt_ann_buckets").inputFiles.toSeq.sorted
    // healthy: nothing above any bar -> both phases healthy, files as-is
    val t0 = trail(IndexOps.maintain(spark, "mnt_ann", "ann_lsh", s"$base/idx"))
    assert(t0("decided") == (("healthy", "none")) &&
      t0("after") == (("healthy", "none")), t0.toString)
    assert(spark.table("mnt_ann_buckets").inputFiles.toSeq.sorted == filesBefore,
      "a healthy decision must execute no rewrite")
    // one deletion under a demo-lowered bar -> compact -> gone from probes
    IndexOps.tombstone(spark, "mnt_ann",
      emb.filter(col("vec_id") === 3L).select(col("vec_id")), 0L)
    val t1 = trail(IndexOps.maintain(spark, "mnt_ann", "ann_lsh", s"$base/idx",
      tombstonePpmBar = 0L))
    assert(t1("decided") == (("compact", "tombstone_ppm")), t1.toString)
    assert(t1("after") == (("healthy", "none")), t1.toString)
    assert(Similarity.annTopKBatchStored(spark, "mnt_ann", batchSize = 8, k = 5)
      .filter(col("vec_id") === 3L).count() == 0,
      "compacted deletion still retrievable")
    dropAll("mnt_ann", Seq("buckets", "vecs", "tombstones", "meta"))
  }

  test("maintain/bm25: batch count past the bar -> compact executed -> healthy") {
    val base = Files.createTempDirectory("mnt_lex")
    Lexical.buildLexIndex(docs.filter(col("doc_id") >= 100), "mnt_lex", s"$base/idx")
    (0 to 4).foreach { b =>
      LexStream.indexBatchLex(spark, docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + b * 100000L).as("doc_id"), col("text")),
        b.toLong, "mnt_lex")
    }
    val t = trail(IndexOps.maintain(spark, "mnt_lex", "bm25", s"$base/idx"))
    assert(t("decided") == (("compact", "batch_count")), t.toString)
    assert(t("after") == (("healthy", "none")), t.toString)
    assert(IndexOps.batchIdsOf(spark, "mnt_lex_postings").size == 1)
    dropAll("mnt_lex", Seq("postings", "doclen", "stats", "tombstones", "meta"))
  }

  test("maintain/dedup_corpus: drop decision past a lowered bar -> compact executed -> healthy") {
    val base = Files.createTempDirectory("mnt_ddc")
    graft.streaming.DedupStream.seedCorpusIndex(docs, "mnt_ddc", s"$base/idx")
    Dedup.tombstoneCorpusDocs(spark, "mnt_ddc",
      docs.filter(col("doc_id") === 5L).select(col("doc_id")), 0L)
    val t = trail(IndexOps.maintain(spark, "mnt_ddc", "dedup_corpus",
      s"$base/idx", tombstonePpmBar = 0L))
    assert(t("decided") == (("compact", "tombstone_ppm")), t.toString)
    assert(t("after") == (("healthy", "none")), t.toString)
    assert(spark.table("mnt_ddc_sizes").filter(col("doc_id") === 5L).count() == 0)
    dropAll("mnt_ddc", Seq("postings", "sizes", "exact", "tombstones", "meta"))
  }

  test("maintain/semdedup: drift -> refit executed -> healthy (learned centroids under the L2 rule)") {
    val base = Files.createTempDirectory("mnt_sem")
    SemDedup.buildSemIndex(emb.filter(col("vec_id") >= 100), "mnt_sem", s"$base/idx")
    SemDedupStream.screenBatchSem(spark, emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 50000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(2.0f)).as("embedding")),
      0L, "mnt_sem", s"$base/dec")
    val t = trail(IndexOps.maintain(spark, "mnt_sem", "semdedup", s"$base/idx"))
    assert(t("decided") == (("refit", "monitor_alert")), t.toString)
    assert(t("after") == (("healthy", "none")), t.toString)
    val (_, _, rule) = SemDedup.semIndexMeta(spark, "mnt_sem")
    assert(rule == SemDedup.RuleL2,
      "maintain's refit must land the learned-centroid (L2-rule) generation")
    dropAll("mnt_sem", Seq("members", "tombstones", "monitor", "meta"))
  }

  test("maintain: unknown family is a loud error, not a silent no-op") {
    val ex = intercept[IllegalArgumentException] {
      IndexOps.maintain(spark, "nope", "faiss", "/tmp/nope")
    }
    assert(ex.getMessage.contains("unknown index family"), ex.getMessage)
    assert(ex.getMessage.contains("ann_lsh"), ex.getMessage)
  }
}
