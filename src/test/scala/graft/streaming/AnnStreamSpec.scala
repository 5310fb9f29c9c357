package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.operators.{Pq, Similarity}
import java.nio.file.{Files, Path, Paths}

/** Streaming embedding-index maintenance (AnnStream): the stored ANN/PQ
  * index grown micro-batch by micro-batch must answer retrieval exactly
  * as the batch recompute over the full corpus would — including vectors
  * ingested several batches ago — and the append-if-absent discipline
  * must make crash replays fill exactly the missing slices.
  */
class AnnStreamSpec extends AnyFunSuite {

  private lazy val emb = graft.Tables.embeddings(spark, sf0001)

  /** Stage `df` as ONE parquet file named `name` inside `inbox` — the
    * file-source contract (one slice file = one unit the
    * maxFilesPerTrigger=1 stream turns into one micro-batch).
    */
  private def stageSlice(df: org.apache.spark.sql.DataFrame, inbox: Path,
      name: String): Unit = {
    val tmp = Files.createTempDirectory("ann_slice").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.createDirectories(inbox)
    Files.move(part.toPath, inbox.resolve(name))
  }

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.awaitTermination()
    ()
  }

  test("ANN index grown by the stream answers exactly like the batch recompute; vectors from two batches ago are retrievable") {
    val base = Files.createTempDirectory("ann_stream")
    val inbox = base.resolve("inbox")
    // seed with the LATE half of the corpus only — every anchor
    // (vec_id < 16) and its true neighbors arrive through the STREAM,
    // across two separate micro-batches, so a hit proves cross-batch
    // freshness (anchors from batch 0 retrieving corpus from batch 1 and
    // the seed alike)
    Similarity.buildAnnIndex(emb.filter(col("vec_id") >= 100),
      "as_ann", s"$base/idx")
    stageSlice(emb.filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding")), inbox, "slice0.parquet")
    stageSlice(emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
      .select(col("vec_id"), col("embedding")), inbox, "slice1.parquet")
    drain(AnnStream.maintainAnn(
      AnnStream.readEmb(spark, inbox.toString, maxFilesPerTrigger = 1),
      "as_ann", s"$base/ckpt"))
    // two micro-batches landed as their own partitions
    val batchIds = spark.table("as_ann_vecs").select(col("batch_id"))
      .distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(batchIds == Seq(-1L, 0L, 1L), s"partitions: $batchIds")
    val stored = Similarity.annTopKBatchStored(spark, "as_ann").collect()
      .map(_.toString).sorted.toSeq
    val recomputed = Similarity.annTopKBatch(emb).collect()
      .map(_.toString).sorted.toSeq
    assert(recomputed.nonEmpty && stored == recomputed)

    // CRASH REPLAY: stage a partial batch-2 state — buckets landed, the
    // JVM died before vecs. The replayed indexBatchAnn must fill EXACTLY
    // the missing table (vecs), never duplicate the present one.
    val ghost = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 7000L).as("vec_id"), col("embedding"))
    val prepared = ghost.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val (bSlice, _) = Similarity.annIndexSlices(prepared, 2L,
      tables = 32, bits = 6)
    graft.sources.Bucketing.appendBucketedPartition(bSlice, "as_ann_buckets")
    AnnStream.indexBatchAnn(spark, ghost, 2L, "as_ann")
    val bCount = spark.table("as_ann_buckets")
      .filter(col("batch_id") === 2L).count()
    val vCount = spark.table("as_ann_vecs")
      .filter(col("batch_id") === 2L).count()
    assert(bCount == 3L * 32, s"buckets batch-2 rows duplicated or lost: $bCount")
    assert(vCount == 3L, s"vecs batch-2 rows: $vCount")
    // a second full replay of the SAME batch is a no-op on both tables
    AnnStream.indexBatchAnn(spark, ghost, 2L, "as_ann")
    assert(spark.table("as_ann_buckets").filter(col("batch_id") === 2L).count() == bCount)
    assert(spark.table("as_ann_vecs").filter(col("batch_id") === 2L).count() == vCount)

    // RESTART: catalog entries die with the session, files survive —
    // reattach and retrieve (the ghost vectors sit far from the anchors'
    // id range and don't perturb the top-5s at this scale; equality is
    // asserted against the recompute over corpus+ghosts)
    Seq("as_ann_buckets", "as_ann_vecs", "as_ann_meta")
      .foreach(t => spark.sql(s"DROP TABLE `$t`"))
    Similarity.reattachAnnIndex(spark, "as_ann", s"$base/idx")
    val afterRestart = Similarity.annTopKBatchStored(spark, "as_ann").collect()
      .map(_.toString).sorted.toSeq
    val recomputedWithGhosts = Similarity.annTopKBatch(
      emb.select(col("vec_id"), col("embedding")).union(ghost)).collect()
      .map(_.toString).sorted.toSeq
    assert(afterRestart == recomputedWithGhosts)
    Seq("as_ann_buckets", "as_ann_vecs", "as_ann_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("PQ index grown by the stream answers exactly like the batch recompute under the FROZEN build-time codebooks") {
    val base = Files.createTempDirectory("pq_stream")
    val inbox = base.resolve("inbox")
    // codebooks fit on the SEED half only — the production rule: deltas
    // are encoded against the index generation's frozen codebooks
    val seed = emb.filter(col("vec_id") >= 100)
    Pq.buildPqIndex(seed, "as_pq", s"$base/idx", iters = 2)
    val cbs = Pq.pqIndexCodebooks(spark, "as_pq")
    stageSlice(emb.filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding")), inbox, "slice0.parquet")
    stageSlice(emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
      .select(col("vec_id"), col("embedding")), inbox, "slice1.parquet")
    drain(AnnStream.maintainPq(
      AnnStream.readEmb(spark, inbox.toString, maxFilesPerTrigger = 1),
      "as_pq", s"$base/ckpt"))
    val stored = Pq.adcTopKBatchStored(spark, "as_pq").collect()
      .map(_.toString).sorted.toSeq
    // recompute over the FULL corpus with the seed-fitted codebooks —
    // adcTopKBatch takes cbs explicitly, so the comparison isolates the
    // streaming growth from the (deliberately frozen) fit
    val recomputed = Pq.adcTopKBatch(emb, cbs).collect()
      .map(_.toString).sorted.toSeq
    assert(recomputed.nonEmpty && stored == recomputed)
    Seq("as_pq_codes", "as_pq_vecs", "as_pq_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("IVF-PQ index grown by the stream answers exactly like the recompute under the FROZEN fits; appended rows land list-partitioned") {
    val base = Files.createTempDirectory("ivfpq_stream")
    val inbox = base.resolve("inbox")
    // seed: coarse + residual fits FROZEN on the late half of the corpus
    val seed = emb.filter(col("vec_id") >= 100)
    Pq.buildIvfPqIndex(seed, "as_ivfpq", s"$base/idx")
    val (coarse, cbs) = Pq.ivfPqIndexMeta(spark, "as_ivfpq")
    stageSlice(emb.filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding")), inbox, "slice0.parquet")
    stageSlice(emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
      .select(col("vec_id"), col("embedding")), inbox, "slice1.parquet")
    drain(AnnStream.maintainIvfPq(
      AnnStream.readEmb(spark, inbox.toString, maxFilesPerTrigger = 1),
      "as_ivfpq", s"$base/ckpt"))
    // appended code rows carry real list ids in the partition layout
    val listsPerBatch = spark.table("as_ivfpq_codes")
      .groupBy(col("batch_id")).agg(countDistinct(col("list_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(listsPerBatch.keySet == Set(-1L, 0L, 1L), listsPerBatch.toString)
    assert(listsPerBatch.values.forall(_ >= 2), s"degenerate list spread: $listsPerBatch")
    val stored = Pq.ivfPqTopKStored(spark, "as_ivfpq", queryVecId = 0L,
      k = 10, nProbe = 6).collect().map(_.toString).sorted.toSeq
    // recompute over the FULL corpus with the seed-frozen fits —
    // ivfPqTopK takes (coarse, cbs) explicitly, isolating streaming
    // growth from the (deliberately frozen) training
    val recomputed = Pq.ivfPqTopK(emb, coarse, cbs, queryVecId = 0L,
      k = 10, nProbe = 6).collect().map(_.toString).sorted.toSeq
    assert(recomputed.nonEmpty && stored == recomputed)
    Seq("as_ivfpq_codes", "as_ivfpq_vecs", "as_ivfpq_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }
}
