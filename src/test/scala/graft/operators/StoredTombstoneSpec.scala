package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import java.nio.file.Files

/** Stored-index DELETION (r12 verdict #1): the pipeline's own
  * dedup/decontam decisions drop documents; tombstoning must make the
  * standing ANN/PQ/IVF-PQ indexes answer EXACTLY as a rebuild from the
  * surviving corpus would — same generation codebooks/planes, deleted
  * vectors neither retrievable, nor anchors, nor able to displace live
  * candidates through an approximate cut.
  */
class StoredTombstoneSpec extends AnyFunSuite {

  private lazy val emb = graft.Tables.embeddings(spark, sf0001)
  // the deletion set: every 7th vector — intersects the anchor range
  // (vec_ids 0, 7, 14 < 16), sits in LSH buckets, PQ candidate cuts, and
  // IVF lists alike, so every arm of the identity below is non-vacuous
  private lazy val dropIds = emb.filter(pmod(col("vec_id"), lit(7)) === 0)
    .select(col("vec_id"))
  private lazy val survivorsEmb = emb.join(dropIds, Seq("vec_id"), "left_anti")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def dropAll(prefix: String): Unit =
    Seq("buckets", "codes", "vecs", "meta", "tombstones", "monitor")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))

  test("tombstoned ANN index answers row-identically to a rebuild from the surviving corpus") {
    val base = Files.createTempDirectory("ts_ann")
    Similarity.buildAnnIndex(emb, "ts_ann", s"$base/idx")
    IndexOps.tombstone(spark, "ts_ann", dropIds, batchId = 0L)
    val stored = sortedRows(Similarity.annTopKBatchStored(spark, "ts_ann"))
    val rebuilt = sortedRows(Similarity.annTopKBatch(survivorsEmb))
    assert(rebuilt.nonEmpty && stored == rebuilt)
    // deleted ids appear nowhere — not as anchors, not as neighbors
    val dropped = dropIds.collect().map(_.getLong(0)).toSet
    val probe = Similarity.annTopKBatchStored(spark, "ts_ann").collect()
    assert(probe.forall(r => !dropped.contains(r.getAs[Long]("anchor_id")) &&
      !dropped.contains(r.getAs[Long]("vec_id"))))
    // a replay of the SAME tombstone batch is a no-op (append-if-absent)
    IndexOps.tombstone(spark, "ts_ann", dropIds, batchId = 0L)
    assert(spark.table("ts_ann_tombstones").count() == dropped.size)
    // tombstones survive a catalog wipe (restart story): reattach, same rows
    dropAll("ts_ann")
    Similarity.reattachAnnIndex(spark, "ts_ann", s"$base/idx")
    assert(sortedRows(Similarity.annTopKBatchStored(spark, "ts_ann")) == rebuilt)
    dropAll("ts_ann")
  }

  test("tombstoned PQ index answers row-identically to a rebuild from survivors under the same frozen codebooks") {
    val base = Files.createTempDirectory("ts_pq")
    // codebooks fit on the FULL corpus (the index generation's frozen
    // fit); the rebuild scores the surviving corpus with the SAME
    // codebooks, read back from meta — deletion must not force a refit
    Pq.buildPqIndex(emb, "ts_pq", s"$base/idx", iters = 2)
    val cbs = Pq.pqIndexCodebooks(spark, "ts_pq")
    IndexOps.tombstone(spark, "ts_pq", dropIds, batchId = 0L)
    val stored = sortedRows(Pq.adcTopKBatchStored(spark, "ts_pq"))
    val rebuilt = sortedRows(Pq.adcTopKBatch(survivorsEmb, cbs))
    assert(rebuilt.nonEmpty && stored == rebuilt)
    dropAll("ts_pq")
  }

  test("tombstoned IVF-PQ index answers row-identically to a rebuild from survivors; a tombstoned QUERY id fails loudly") {
    val base = Files.createTempDirectory("ts_ivfpq")
    Pq.buildIvfPqIndex(emb, "ts_ivfpq", s"$base/idx")
    val (coarse, cbs) = Pq.ivfPqIndexMeta(spark, "ts_ivfpq")
    IndexOps.tombstone(spark, "ts_ivfpq", dropIds, batchId = 0L)
    // query id 1 survives (1 % 7 != 0)
    val stored = sortedRows(Pq.ivfPqTopKStored(spark, "ts_ivfpq",
      queryVecId = 1L, k = 10, nProbe = 6))
    val rebuilt = sortedRows(Pq.ivfPqTopK(survivorsEmb, coarse, cbs,
      queryVecId = 1L, k = 10, nProbe = 6))
    assert(rebuilt.nonEmpty && stored == rebuilt)
    // query id 0 is tombstoned: probing around a deleted vector must
    // throw, not silently return an empty or stale answer
    val e = intercept[IllegalArgumentException] {
      Pq.ivfPqTopKStored(spark, "ts_ivfpq", queryVecId = 0L)
    }
    assert(e.getMessage.contains("tombstoned"))
    dropAll("ts_ivfpq")
  }
}
