package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.operators.{Dedup, IndexOps}
import java.nio.file.Files

/** Tombstones + compaction for the STORED dedup corpus index (r13
  * verdict #2): the streamed shingle/exact index was grow-only — probe
  * cost grew with batch count, and a DROPPED document kept suppressing
  * new duplicates of itself forever. Under the IndexOps lifecycle a
  * tombstoned doc must stop matching (exact and near arms both), screen
  * decisions must equal a recompute against the surviving text corpus,
  * and the generation rewrite must fold partitions while keeping every
  * decision identical and fencing pre-compaction replays.
  */
class DedupLifecycleSpec extends AnyFunSuite {

  private lazy val docs = graft.Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def dropAll(prefix: String): Unit =
    Seq("postings", "sizes", "exact", "tombstones", "meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))

  private def decisionsOf(dir: String, batchId: Long): DataFrame =
    spark.read.parquet(s"$dir/batch_id=$batchId")

  test("a tombstoned corpus doc stops suppressing its duplicates; decisions equal a recompute over the surviving corpus; compaction folds, keeps answers and fences replays") {
    val base = Files.createTempDirectory("dls")
    val decisions = s"$base/decisions"
    val seed = docs.filter(col("doc_id") >= 100)
    DedupStream.seedCorpusIndex(seed, "dls", s"$base/idx")

    // the victim: a SYNTHETIC unique doc (vocabulary disjoint from the
    // corpus, so neither arm can match anything else) kept in batch 0
    import spark.implicits._
    val victimText = "graftuniq alpha beta gamma delta epsilon zeta eta theta"
    val victimId = 9000L
    val batch0 = docs.filter(col("doc_id") < 50)
      .union(Seq((victimId, victimText)).toDF("doc_id", "text"))
    DedupStream.screenBatchStored(spark, batch0, 0L, "dls", decisions)
    assert(decisionsOf(decisions, 0L)
      .filter(col("doc_id") === victimId).collect()(0)
      .getAs[Long]("keep") == 1L, "unique victim was not kept")

    // its duplicate in batch 1 is suppressed by the exact arm...
    val dupOfVictim = Seq((9001L, victimText)).toDF("doc_id", "text")
    DedupStream.screenBatchStored(spark, dupOfVictim, 1L, "dls", decisions)
    val d1 = decisionsOf(decisions, 1L).collect()(0)
    assert(d1.getAs[Long]("exact_dup_of") == victimId &&
      d1.getAs[Long]("keep") == 0L, s"pre-deletion screen: $d1")

    // ...then DROP the victim (a q107/q138-style decision): the same
    // text under another id must now be KEPT — the grow-only staleness
    // the verdict called out is gone
    Dedup.tombstoneCorpusDocs(spark, "dls",
      Seq(victimId).toDF("doc_id"), batchId = 0L)
    val dupAfterDrop = Seq((9002L, victimText)).toDF("doc_id", "text")
    DedupStream.screenBatchStored(spark, dupAfterDrop, 2L, "dls", decisions)
    val d2 = decisionsOf(decisions, 2L).collect()(0)
    assert(d2.isNullAt(d2.fieldIndex("exact_dup_of")) &&
      d2.isNullAt(d2.fieldIndex("near_dup_of")) &&
      d2.getAs[Long]("keep") == 1L, s"post-deletion screen: $d2")

    // full-frame rebuild identity: a fresh probe batch's stored-screen
    // decisions equal the RECOMPUTE against the surviving text corpus
    // (seed + every kept doc, minus the tombstoned victim)
    def keptOf(batch: DataFrame): DataFrame =
      batch.join(spark.read.parquet(decisions)
        .filter(col("keep") === 1L).select(col("doc_id")), Seq("doc_id"))
    val corpusNow = seed
      .union(keptOf(batch0.union(dupOfVictim).union(dupAfterDrop)))
      .filter(col("doc_id") =!= victimId)
    val probe = docs.filter(col("doc_id") >= 50 && col("doc_id") < 80)
      .select((col("doc_id") + 5000L).as("doc_id"), col("text"))
      .union(docs.filter(col("doc_id") >= 100).orderBy(col("doc_id")).limit(2)
        .select((col("doc_id") + 6000L).as("doc_id"), col("text")))
    val expected = sortedRows(
      Dedup.incrementalDedup(probe, corpusNow, threshold = 0.8))
    DedupStream.screenBatchStored(spark, probe, 3L, "dls", decisions)
    assert(expected.nonEmpty &&
      sortedRows(decisionsOf(decisions, 3L)) == expected,
      "stored screen != recompute over surviving corpus")

    // COMPACTION: fold the batch partitions, purge the victim, keep
    // every later decision identical
    val filesBefore = spark.table("dls_postings").inputFiles.length
    Dedup.compactCorpusIndex(spark, "dls", s"$base/idx")
    assert(spark.table("dls_tombstones").count() == 0)
    assert(spark.table("dls_exact")
      .filter(col("corp_id") === victimId).count() == 0,
      "tombstoned winner survived compaction in the exact arm")
    val gens = IndexOps.batchIdsOf(spark, "dls_postings")
    assert(gens.size == 1, s"generations after compaction: $gens")
    val filesAfter = spark.table("dls_postings").inputFiles.length
    assert(filesAfter < filesBefore,
      s"postings files $filesBefore -> $filesAfter")
    // fresh probe decisions re-derive identically from the folded
    // generation (fresh ids — the fence blocks same-id replays)
    val corpusNow2 = corpusNow.union(keptOf(probe))
    val probe2 = probe.select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val expected2 = sortedRows(
      Dedup.incrementalDedup(probe2, corpusNow2, threshold = 0.8))
    DedupStream.screenBatchStored(spark, probe2, 4L, "dls", decisions)
    assert(sortedRows(decisionsOf(decisions, 4L)) == expected2,
      "post-compaction screen != recompute")

    // REPLAY FENCE: a pre-compaction batch id is a no-op — replaying
    // batch 1 with DIFFERENT content must neither rewrite its decisions
    // nor append rows (an unfenced replay would overwrite both)
    val rows = spark.table("dls_sizes").count()
    DedupStream.screenBatchStored(spark,
      Seq((9001L, "entirely different replay text")).toDF("doc_id", "text"),
      1L, "dls", decisions)
    val d1Again = decisionsOf(decisions, 1L).collect()(0)
    assert(d1Again.getAs[Long]("exact_dup_of") == victimId &&
      d1Again.getAs[Long]("keep") == 0L,
      s"fenced replay rewrote batch-1 decisions: $d1Again")
    assert(spark.table("dls_sizes").count() == rows)

    // RESTART: reattach restores all five tables (incl. lifecycle ones)
    // and screening continues exactly (corpus now also holds probe2's
    // batch-4 keeps)
    dropAll("dls")
    DedupStream.reattachCorpusIndex(spark, "dls", s"$base/idx")
    assert(spark.catalog.tableExists("dls_tombstones") &&
      spark.catalog.tableExists("dls_meta"))
    val corpusNow3 = corpusNow2.union(keptOf(probe2))
    val probe3 = probe.select((col("doc_id") + 200000L).as("doc_id"), col("text"))
    val expected3 = sortedRows(
      Dedup.incrementalDedup(probe3, corpusNow3, threshold = 0.8))
    DedupStream.screenBatchStored(spark, probe3, 5L, "dls", decisions)
    assert(sortedRows(decisionsOf(decisions, 5L)) == expected3,
      "post-restart screen != recompute")
    dropAll("dls")
  }

  test("a deletion landing inside a replay window is detected: the replay keeps the durable decisions the landed slices are children of (advisor r15)") {
    val base = Files.createTempDirectory("dvg")
    val decisions = s"$base/decisions"
    import spark.implicits._
    DedupStream.seedCorpusIndex(docs.filter(col("doc_id") >= 100), "dvg",
      s"$base/idx")
    val victimText = "graftuniq2 one two three four five six seven eight"
    DedupStream.screenBatchStored(spark,
      Seq((9100L, victimText)).toDF("doc_id", "text"), 0L, "dvg", decisions)
    // batch 1: a dup of the unique victim — suppressed; slices landed
    val batch1 = Seq((9101L, victimText)).toDF("doc_id", "text")
    DedupStream.screenBatchStored(spark, batch1, 1L, "dvg", decisions)
    val before = sortedRows(decisionsOf(decisions, 1L))
    assert(decisionsOf(decisions, 1L).collect()(0).getAs[Long]("keep") == 0L)
    // the deletion lands INSIDE batch 1's replay window (a cadence
    // violation — deletions are supposed to run between replay windows)
    Dedup.tombstoneCorpusDocs(spark, "dvg", Seq(9100L).toDF("doc_id"), 0L)
    // the replay observes a different tombstone generation than batch
    // 1's sidecar recorded: without the guard it would overwrite the
    // decisions with the post-deletion recompute (keep=1) while the
    // already-landed index slices are children of keep=0
    DedupStream.screenBatchStored(spark, batch1, 1L, "dvg", decisions)
    assert(sortedRows(decisionsOf(decisions, 1L)) == before,
      "replay overwrote durable decisions under a different deletion set")
    // a FRESH batch (no recorded generation) sees the deletion normally
    DedupStream.screenBatchStored(spark,
      Seq((9102L, victimText)).toDF("doc_id", "text"), 2L, "dvg", decisions)
    assert(decisionsOf(decisions, 2L).collect()(0).getAs[Long]("keep") == 1L,
      "fresh batch after the deletion must be screened under the new set")
    dropAll("dvg")
  }
}
