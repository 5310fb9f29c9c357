package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.streaming.AnnStream
import java.nio.file.Files

/** Stored-index COMPACTION (r12 verdict #2): streaming maintenance
  * appends one batch_id partition per micro-batch, so probe cost grew
  * with batch COUNT. The generation rewrite must (a) keep every probe
  * row-identical, (b) physically purge tombstoned rows and consume the
  * tombstone table, (c) collapse the file count back to O(buckets), and
  * (d) fence pre-compaction replays so at-least-once delivery cannot
  * re-duplicate folded rows.
  */
class IndexCompactionSpec extends AnyFunSuite {

  private lazy val emb = graft.Tables.embeddings(spark, sf0001)
    .select(col("vec_id"), col("embedding"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def dropAll(prefix: String): Unit =
    Seq("buckets", "codes", "vecs", "meta", "tombstones", "monitor")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))

  test("ANN compaction: row-identical probes, O(buckets) files, consumed tombstones, replay fence") {
    val base = Files.createTempDirectory("ca_ann")
    // seed on the late half, grow by two maintenance batches — three
    // batch_id partitions per table
    Similarity.buildAnnIndex(emb.filter(col("vec_id") >= 100), "ca_ann", s"$base/idx")
    val batch0 = emb.filter(col("vec_id") < 50)
    val batch1 = emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
    AnnStream.indexBatchAnn(spark, batch0, 0L, "ca_ann")
    AnnStream.indexBatchAnn(spark, batch1, 1L, "ca_ann")
    val drops = emb.filter(pmod(col("vec_id"), lit(9)) === 3).select(col("vec_id"))
    IndexOps.tombstone(spark, "ca_ann", drops, batchId = 0L)
    val before = sortedRows(Similarity.annTopKBatchStored(spark, "ca_ann"))
    val filesBefore = spark.table("ca_ann_buckets").inputFiles.length
    val liveRows = spark.table("ca_ann_vecs")
      .join(drops, Seq("vec_id"), "left_anti").count()

    Similarity.compactAnnIndex(spark, "ca_ann", s"$base/idx")

    // (a) probes answer identically (and match a rebuild from survivors)
    val after = sortedRows(Similarity.annTopKBatchStored(spark, "ca_ann"))
    assert(before.nonEmpty && after == before)
    assert(after == sortedRows(Similarity.annTopKBatch(
      emb.join(drops, Seq("vec_id"), "left_anti"))))
    // (b) tombstoned rows physically gone, tombstone table consumed
    assert(spark.table("ca_ann_vecs").count() == liveRows)
    assert(spark.table("ca_ann_tombstones").count() == 0)
    // (c) ONE generation partition, file count collapsed to O(buckets)
    val batchIds = spark.table("ca_ann_vecs").select(col("batch_id"))
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(batchIds == Seq(1L), s"generations after compaction: $batchIds")
    val filesAfter = spark.table("ca_ann_buckets").inputFiles.length
    assert(filesAfter <= 8 && filesAfter < filesBefore,
      s"buckets files $filesBefore -> $filesAfter (nBuckets = 8)")
    // (d) a pre-compaction replay is a no-op (batch 1 was folded away;
    // the per-partition probe alone would re-append it)
    AnnStream.indexBatchAnn(spark, batch1, 1L, "ca_ann")
    assert(spark.table("ca_ann_vecs").count() == liveRows)
    // ...while genuinely NEW batches still land and are retrievable
    val ghost = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 7000L).as("vec_id"), col("embedding"))
    AnnStream.indexBatchAnn(spark, ghost, 2L, "ca_ann")
    assert(spark.table("ca_ann_vecs").count() == liveRows + 3)
    assert(sortedRows(Similarity.annTopKBatchStored(spark, "ca_ann")) ==
      sortedRows(Similarity.annTopKBatch(
        emb.join(drops, Seq("vec_id"), "left_anti").union(ghost))))
    dropAll("ca_ann")
  }

  test("IVF-PQ compaction preserves the list-directory layout and the frozen-fit answers") {
    val base = Files.createTempDirectory("ca_ivfpq")
    Pq.buildIvfPqIndex(emb.filter(col("vec_id") >= 100), "ca_ivfpq", s"$base/idx")
    val (coarse, cbs) = Pq.ivfPqIndexMeta(spark, "ca_ivfpq")
    AnnStream.indexBatchIvfPq(spark, emb.filter(col("vec_id") < 50), 0L, "ca_ivfpq")
    AnnStream.indexBatchIvfPq(spark,
      emb.filter(col("vec_id") >= 50 && col("vec_id") < 100), 1L, "ca_ivfpq")
    val drops = emb.filter(pmod(col("vec_id"), lit(9)) === 3).select(col("vec_id"))
    IndexOps.tombstone(spark, "ca_ivfpq", drops, batchId = 0L)
    val before = sortedRows(Pq.ivfPqTopKStored(spark, "ca_ivfpq",
      queryVecId = 1L, k = 10, nProbe = 6))
    val listsBefore = spark.table("ca_ivfpq_codes")
      .select(col("list_id")).distinct().count()

    Pq.compactIvfPqIndex(spark, "ca_ivfpq", s"$base/idx")

    val after = sortedRows(Pq.ivfPqTopKStored(spark, "ca_ivfpq",
      queryVecId = 1L, k = 10, nProbe = 6))
    assert(before.nonEmpty && after == before)
    assert(after == sortedRows(Pq.ivfPqTopK(
      emb.join(drops, Seq("vec_id"), "left_anti"), coarse, cbs,
      queryVecId = 1L, k = 10, nProbe = 6)))
    // the (batch_id, list_id) layout survives: one generation, the same
    // list spread — probes still prune whole list directories
    val parts = spark.table("ca_ivfpq_codes")
      .select(col("batch_id"), col("list_id")).distinct().collect()
    assert(parts.map(_.getLong(0)).distinct.toSeq == Seq(1L))
    assert(parts.length.toLong == listsBefore ||
      parts.length.toLong <= listsBefore, s"lists: $listsBefore -> ${parts.length}")
    assert(spark.table("ca_ivfpq_tombstones").count() == 0)
    dropAll("ca_ivfpq")
  }

  test("swap-crash recovery is mechanical: a missing live dir with a surviving __old sibling restores the previous generation (advisor r13)") {
    val base = Files.createTempDirectory("rs_ann")
    Similarity.buildAnnIndex(emb.filter(col("vec_id") >= 100), "rs_ann", s"$base/idx")
    AnnStream.indexBatchAnn(spark, emb.filter(col("vec_id") < 50), 0L, "rs_ann")
    val before = sortedRows(Similarity.annTopKBatchStored(spark, "rs_ann"))
    // simulate the crash INSIDE swapIn's two-rename window on the vecs
    // table: live moved to __old, tmp (__compact) written, JVM died
    // before tmp -> live; catalog entry gone with the "restart"
    val live = s"$base/idx/vecs"
    IndexOps.moveDir(spark, live, s"${live}__old")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"${live}__compact"))
    spark.sql("DROP TABLE rs_ann_vecs")
    assert(IndexOps.recoverSwap(spark, "rs_ann_vecs", live))
    assert(IndexOps.dirExists(spark, live) &&
      !IndexOps.dirExists(spark, s"${live}__old") &&
      !IndexOps.dirExists(spark, s"${live}__compact"))
    // reattach sees the restored generation; probes answer as before
    Similarity.reattachAnnIndex(spark, "rs_ann", s"$base/idx")
    assert(sortedRows(Similarity.annTopKBatchStored(spark, "rs_ann")) == before)
    // idempotent: with a healthy live dir the helper is a no-op
    assert(!IndexOps.recoverSwap(spark, "rs_ann_vecs", live))
    // ...and the next compaction runs clean over the recovered state
    Similarity.compactAnnIndex(spark, "rs_ann", s"$base/idx")
    assert(sortedRows(Similarity.annTopKBatchStored(spark, "rs_ann")) == before)
    dropAll("rs_ann")
  }

  test("IVF-PQ refit generation: both fits refreshed on the surviving corpus, stored answers row-identical to the recompute under the new fits") {
    val base = Files.createTempDirectory("rf_ivfpq")
    Pq.buildIvfPqIndex(emb.filter(col("vec_id") >= 100), "rf_ivfpq", s"$base/idx")
    val (oldCoarse, _) = Pq.ivfPqIndexMeta(spark, "rf_ivfpq")
    AnnStream.indexBatchIvfPq(spark, emb.filter(col("vec_id") < 100), 0L, "rf_ivfpq")
    val drops = emb.filter(pmod(col("vec_id"), lit(9)) === 3).select(col("vec_id"))
    IndexOps.tombstone(spark, "rf_ivfpq", drops, batchId = 0L)

    Pq.refitIvfPqIndex(spark, "rf_ivfpq", s"$base/idx")

    // both fits are NEW (fitted on seed + streamed + minus drops, not the
    // seed alone) and tombstones are consumed by the rewrite
    val (newCoarse, newCbs) = Pq.ivfPqIndexMeta(spark, "rf_ivfpq")
    assert(newCoarse != oldCoarse, "coarse centroids did not refit")
    assert(spark.table("rf_ivfpq_tombstones").count() == 0)
    val survivors = emb.join(drops, Seq("vec_id"), "left_anti")
    val stored = sortedRows(Pq.ivfPqTopKStored(spark, "rf_ivfpq",
      queryVecId = 1L, k = 10, nProbe = 6))
    val recomputed = sortedRows(Pq.ivfPqTopK(survivors, newCoarse, newCbs,
      queryVecId = 1L, k = 10, nProbe = 6))
    assert(recomputed.nonEmpty && stored == recomputed)
    dropAll("rf_ivfpq")
  }
}
