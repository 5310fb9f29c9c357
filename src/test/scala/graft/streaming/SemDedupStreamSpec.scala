package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.operators.{Clustering, IndexOps, SemDedup}
import java.nio.file.Files

/** The stored semantic-dedup index (r14 verdict #5): every stored-screen
  * decision must equal the batch RECOMPUTE over the grown corpus
  * (DedupLifecycleSpec's contract, semantic arm), deletions must revive
  * suppression, compaction and restart must keep identity, and the
  * assignment-distance staleness monitor must alert exactly when the
  * incoming distribution drifts off the frozen centroids — feeding the
  * q176 maintenance policy unchanged.
  */
class SemDedupStreamSpec extends AnyFunSuite {

  private lazy val emb = graft.Tables.embeddings(spark, sf0001)
    .select(col("vec_id"), col("embedding"))
  private val cs = Clustering.centroids(16, 64)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def dropAll(prefix: String): Unit =
    Seq("members", "tombstones", "monitor", "meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))

  private def decisionsOf(dir: String, b: Long): DataFrame =
    spark.read.parquet(s"$dir/batch_id=$b")

  test("stored semantic screen equals the recompute over the grown corpus; deletion revives suppression; compaction/restart keep identity") {
    val base = Files.createTempDirectory("semdedup")
    val decisions = s"$base/dec"
    val seed = emb.filter(col("vec_id") >= 100)
    SemDedup.buildSemIndex(seed, "sds", s"$base/idx")

    // batch 0 vs the seed corpus
    val batch0 = emb.filter(col("vec_id") < 50)
    SemDedupStream.screenBatchSem(spark, batch0, 0L, "sds", decisions)
    val got0 = sortedRows(decisionsOf(decisions, 0L))
    val exp0 = sortedRows(SemDedup.incrementalSemanticDedup(batch0, seed, cs))
    assert(got0.nonEmpty && got0 == exp0, "batch-0 screen != recompute")
    val d0 = decisionsOf(decisions, 0L)
    assert(d0.filter(col("keep") === 0L).count() > 0 &&
      d0.filter(col("keep") === 1L).count() > 0,
      "batch 0 must exercise both decisions at sf0.001 (corpus property)")

    // batch 1 vs the GROWN corpus (seed + batch-0 keeps): cross-batch
    // freshness — a vector kept in batch 0 suppresses batch-1 duplicates
    def keptOf(batch: DataFrame): DataFrame =
      batch.join(spark.read.parquet(decisions)
        .filter(col("keep") === 1L).select(col("vec_id")), Seq("vec_id"))
    val corpus1 = seed.union(keptOf(batch0))
    val batch1 = emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
    SemDedupStream.screenBatchSem(spark, batch1, 1L, "sds", decisions)
    assert(sortedRows(decisionsOf(decisions, 1L)) ==
      sortedRows(SemDedup.incrementalSemanticDedup(batch1, corpus1, cs)),
      "batch-1 screen != recompute over grown corpus")
    // same-content replay converges: the member slice lands exactly once
    val membersNow = spark.table("sds_members").count()
    SemDedupStream.screenBatchSem(spark, batch1, 1L, "sds", decisions)
    assert(spark.table("sds_members").count() == membersNow)

    // DELETION: drop a doc that currently suppresses duplicates — its
    // exact copy under a fresh id must re-derive from the SURVIVING
    // corpus (and in particular never match the tombstoned victim).
    // The DELETE-stream batch id (7) is deliberately HIGHER than the
    // screen's data-batch id (2): the two streams number independently,
    // so the screen must apply the deletion UNFENCED — a data-batch-id
    // fence on the tombstone table would hide it (the r14-advisor
    // apples-to-oranges comparison, pinned here for the semantic arm)
    val victim = decisionsOf(decisions, 1L)
      .filter(col("sem_dup_of").isNotNull)
      .orderBy(col("vec_id")).limit(1)
      .collect()(0).getAs[Long]("sem_dup_of")
    SemDedup.tombstoneVecs(spark, "sds",
      spark.range(victim, victim + 1).select(col("id").as("vec_id")), 7L)
    import spark.implicits._
    val copyOfVictim = emb.filter(col("vec_id") === victim)
      .select(lit(900001L).as("vec_id"), col("embedding"))
    val corpus2 = corpus1.union(keptOf(batch1))
      .filter(col("vec_id") =!= victim)
    SemDedupStream.screenBatchSem(spark, copyOfVictim, 2L, "sds", decisions)
    val d2 = decisionsOf(decisions, 2L).collect()(0)
    assert(d2.isNullAt(d2.fieldIndex("sem_dup_of")) ||
      d2.getAs[Long]("sem_dup_of") != victim,
      s"tombstoned victim still suppresses its duplicate: $d2")
    assert(sortedRows(decisionsOf(decisions, 2L)) ==
      sortedRows(SemDedup.incrementalSemanticDedup(copyOfVictim, corpus2, cs)),
      "post-deletion screen != recompute over survivors")

    // COMPACTION: fold generations, purge the victim, keep decisions
    val filesBefore = spark.table("sds_members").inputFiles.length
    SemDedup.compactSemIndex(spark, "sds", s"$base/idx")
    assert(spark.table("sds_tombstones").count() == 0)
    assert(spark.table("sds_members")
      .filter(col("vec_id") === victim).count() == 0,
      "tombstoned member survived compaction")
    assert(IndexOps.batchIdsOf(spark, "sds_members").size == 1)
    assert(spark.table("sds_members").inputFiles.length < filesBefore)
    val corpus3 = corpus2.union(keptOf(copyOfVictim))
    val batch3 = emb.filter(col("vec_id") < 30)
      .select((col("vec_id") + 700000L).as("vec_id"), col("embedding"))
    SemDedupStream.screenBatchSem(spark, batch3, 3L, "sds", decisions)
    assert(sortedRows(decisionsOf(decisions, 3L)) ==
      sortedRows(SemDedup.incrementalSemanticDedup(batch3, corpus3, cs)),
      "post-compaction screen != recompute")
    // pre-compaction replay is fenced: different content, no effect
    val rows = spark.table("sds_members").count()
    SemDedupStream.screenBatchSem(spark, copyOfVictim, 1L, "sds", decisions)
    assert(spark.table("sds_members").count() == rows)

    // RESTART: catalog dies, files survive, screening continues exactly
    dropAll("sds")
    SemDedup.reattachSemIndex(spark, "sds", s"$base/idx")
    val corpus4 = corpus3.union(keptOf(batch3))
    val batch4 = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 800000L).as("vec_id"), col("embedding"))
    SemDedupStream.screenBatchSem(spark, batch4, 4L, "sds", decisions)
    assert(sortedRows(decisionsOf(decisions, 4L)) ==
      sortedRows(SemDedup.incrementalSemanticDedup(batch4, corpus4, cs)),
      "post-restart screen != recompute")
    dropAll("sds")
  }

  test("assignment-distance staleness: a drifted batch alerts (and flips the maintenance policy to refit); an in-range batch does not") {
    val base = Files.createTempDirectory("semdrift")
    val decisions = s"$base/dec"
    SemDedup.buildSemIndex(emb.filter(col("vec_id") >= 100), "sdd", s"$base/idx")
    // in-range batch: same distribution as the build corpus
    SemDedupStream.screenBatchSem(spark,
      emb.filter(col("vec_id") < 50), 0L, "sdd", decisions)
    // drifted batch: +2 per dimension — ||v − c||² inflates by ~|dims|·4
    // against unit-norm centroids, far past the 2x-of-build bar
    SemDedupStream.screenBatchSem(spark,
      emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 50000L).as("vec_id"),
          transform(col("embedding"), x => x + lit(2.0f)).as("embedding")),
      1L, "sdd", decisions)
    val mon = spark.table("sdd_monitor").orderBy(col("batch_id")).collect()
    assert(mon.length == 2, mon.mkString(";"))
    assert(mon(0).getAs[Long]("alert") == 0L,
      s"in-range batch alerted: ${mon(0)}")
    assert(mon(1).getAs[Long]("alert") == 1L &&
      mon(1).getAs[Long]("mse_micros") >
        graft.operators.Pq.StalenessFactor * mon(1).getAs[Long]("build_mse_micros"),
      s"drifted batch did not alert: ${mon(1)}")
    // the shared policy operator reads this family unchanged
    val pol = IndexOps.maintenancePolicy(spark, "sdd", "semdedup",
      dataTable = "members").collect()(0)
    assert(pol.getAs[String]("decision") == "refit" &&
      pol.getAs[String]("triggered_by") == "monitor_alert", pol.toString)

    // REFIT GENERATION — the decision's consumer: new centroids fitted
    // over the surviving members (Lloyd, the L2 rule learned centroids
    // require), members re-assigned as one generation, fresh baseline,
    // fences advanced past every monitor row -> policy healthy again
    SemDedup.refitSemIndex(spark, "sdd", s"$base/idx")
    val polAfter = IndexOps.maintenancePolicy(spark, "sdd", "semdedup",
      dataTable = "members").collect()(0)
    assert(polAfter.getAs[String]("decision") == "healthy", polAfter.toString)
    val (cs2, _, rule2) = SemDedup.semIndexMeta(spark, "sdd")
    assert(rule2 == SemDedup.RuleL2 && cs2 != cs,
      "refit must record learned centroids under the L2 rule")
    // screening continues EXACTLY under the refit generation: the
    // recompute twin fits the same centroids from the same surviving
    // raw corpus (stored v is the bit-exact double cast) and assigns
    // both sides under the L2 rule
    def keptOf(batch: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      batch.join(spark.read.parquet(decisions)
        .filter(col("keep") === 1L).select(col("vec_id")), Seq("vec_id"))
    val drifted1 = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 50000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(2.0f)).as("embedding"))
    val corpusNow = emb.filter(col("vec_id") >= 100)
      .union(keptOf(emb.filter(col("vec_id") < 50)))
      .union(keptOf(drifted1))
    val csTwin = Clustering.fitCentroids(corpusNow, 16, 64, iters = 2, seed = 7L)
    assert(csTwin == cs2, "refit centroids != fit over the raw survivors")
    val batch2 = emb.filter(col("vec_id") >= 50 && col("vec_id") < 80)
      .select((col("vec_id") + 600000L).as("vec_id"), col("embedding"))
    SemDedupStream.screenBatchSem(spark, batch2, 2L, "sdd", decisions)
    val got2 = decisionsOf(decisions, 2L).collect().map(_.toString).sorted.toSeq
    val exp2 = SemDedup.incrementalSemanticDedup(batch2, corpusNow, cs2,
      rule = SemDedup.RuleL2).collect().map(_.toString).sorted.toSeq
    assert(got2.nonEmpty && got2 == exp2,
      "post-refit screen != recompute under the refit generation")
    // an in-distribution batch is quiet against the refreshed baseline
    val mon2 = spark.table("sdd_monitor").filter(col("batch_id") === 2L)
      .collect()(0)
    assert(mon2.getAs[Long]("alert") == 0L,
      s"in-distribution batch alerted after refit: $mon2")
    dropAll("sdd")
  }

  test("an all-malformed micro-batch contributes NOTHING: no decisions file, no monitor row, no members partition (absence is the consistent representation — advisor r15)") {
    val base = Files.createTempDirectory("semempty")
    val decisions = s"$base/dec"
    SemDedup.buildSemIndex(emb.filter(col("vec_id") >= 100), "sde", s"$base/idx")
    val bad = emb.filter(col("vec_id") < 5)
      .select(lit(null).cast("long").as("vec_id"), col("embedding"))
    SemDedupStream.screenBatchSem(spark, bad, 0L, "sde", decisions)
    assert(!new java.io.File(s"$decisions/batch_id=0").exists(),
      "empty-after-filter batch wrote a decisions file")
    assert(spark.table("sde_monitor").count() == 0,
      "empty-after-filter batch appended a monitor row")
    assert(spark.table("sde_members").filter(col("batch_id") === 0L).count() == 0)
    // a later real batch under the same id screens normally (the guard
    // returned BEFORE any append, so nothing fences the id)
    SemDedupStream.screenBatchSem(spark, emb.filter(col("vec_id") < 5),
      0L, "sde", decisions)
    assert(spark.table("sde_monitor").count() == 1)
    dropAll("sde")
  }
}
