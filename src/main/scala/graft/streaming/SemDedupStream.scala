package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{IndexOps, SemDedup}

/** Streaming maintenance of the STORED semantic-dedup index — the
  * semantic arm's twin of [[DedupStream.screenStored]], under the one
  * AnnStream discipline: each embedding micro-batch is SCREENED against
  * the standing cluster members (`SemDedup.screenSem` — frozen
  * centroids, exact cosine vs same-cluster survivors), its decisions
  * land durably per batch, its KEPT vectors grow the members table
  * under the batch's `batch_id` partition, and its staleness-monitor
  * row records assignment-distance drift. Append-if-absent probed PER
  * TABLE; all corpus reads prune to `batch_id < batchId`, so an
  * at-least-once replay recomputes identical decisions and fills
  * exactly the missing slices; pre-compaction replays are fenced by
  * `compacted_through`. The DELETION CAVEAT and its cadence rule are
  * [[DedupStream.screenBatchStored]]'s, verbatim: tombstones are
  * applied unfenced (the delete stream numbers its batches
  * independently) and deletions run between replay windows.
  */
object SemDedupStream {

  /** One micro-batch of the stored semantic screen. */
  def screenBatchSem(spark: SparkSession, batch: DataFrame, batchId: Long,
      tablePrefix: String, decisionsDir: String,
      minCos: Double = 0.35): Unit = {
    if (batchId <= IndexOps.compactedThrough(spark, tablePrefix)) return
    val b = batch.select(col("vec_id"), col("embedding"))
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
    // an all-malformed micro-batch contributes NOTHING — no decisions
    // file, no monitor row, no members partition (absence is the
    // consistent representation across all tables; the indexBatchLex
    // rule, mirrored here so the semantic arm can't land a lone
    // n_vecs=0 monitor partition with no members slice)
    if (b.limit(1).isEmpty) return
    // record-and-detect the observed deletion set per decisions batch —
    // the screenBatchStored rule, mirrored (see AnnStream.tsGenPath)
    val tsGen = IndexOps.tombstoneGen(spark, tablePrefix)
    if (!AnnStream.divergentReplay(spark, decisionsDir, batchId, tsGen,
        tablePrefix)) {
      val decisions = SemDedup.screenSem(spark, b, tablePrefix, minCos,
        maxBatchId = batchId)
      decisions.write.mode("overwrite")
        .parquet(s"$decisionsDir/batch_id=$batchId")
      AnnStream.recordTsGen(spark, decisionsDir, batchId, tsGen)
    }
    val (cs, buildMse, rule) = SemDedup.semIndexMeta(spark, tablePrefix)
    val absent = Seq("members", "monitor").filter { t =>
      spark.table(s"${tablePrefix}_$t")
        .filter(col("batch_id") === batchId).limit(1).count() == 0
    }
    if (absent.nonEmpty) {
      // members grow from the DURABLE decisions' keeps (the
      // DedupStream.screenBatchStored child-of-decisions rule); the
      // monitor row measures the WHOLE batch (drift is a property of
      // what arrived, not of what survived dedup)
      val kept = spark.read.parquet(s"$decisionsDir/batch_id=$batchId")
        .filter(col("keep") === 1L).select(col("vec_id"))
      val byName = Map(
        "members" -> SemDedup.memberSlice(b.join(kept, "vec_id"), batchId, cs, rule),
        "monitor" -> SemDedup.monitorSlice(b, batchId, cs, buildMse, rule))
      absent.foreach(t =>
        graft.sources.Bucketing.appendBucketedPartition(
          byName(t), s"${tablePrefix}_$t"))
    }
  }

  /** The streaming maintainer: AvailableNow over an embedding inbox
    * ([[AnnStream.embSchema]]), idempotent batch_id-keyed screen +
    * growth via [[screenBatchSem]]. Seed the index first
    * (`SemDedup.buildSemIndex` — batch_id -1); after a restart,
    * re-attach (`SemDedup.reattachSemIndex`) before starting.
    */
  def screenStream(emb: DataFrame, tablePrefix: String, decisionsDir: String,
      checkpoint: String, minCos: Double = 0.35): StreamingQuery = {
    StreamIngest.applyStateStoreDefaults(emb.sparkSession)
    emb.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        screenBatchSem(batch.sparkSession, batch.toDF(), batchId,
          tablePrefix, decisionsDir, minCos)
      }
      .start()
  }
}
