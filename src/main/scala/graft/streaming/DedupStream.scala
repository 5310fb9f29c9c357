package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.operators.Dedup

/** Streaming face of incremental dedup (the q124 / `Dedup.incrementalDedup`
  * shape): a document stream is screened micro-batch by micro-batch against
  * a STANDING corpus that grows with every accepted batch — the production
  * ingest loop at 100 TB, where the corpus is never re-deduped and each
  * day's delta only pays for its own postings.
  *
  * Exactly-once without sink transactions: both writers key their output by
  * `batch_id` and OVERWRITE that one directory. A batch replayed after a
  * crash (foreachBatch offers at-least-once) recomputes the SAME rows —
  * `incrementalDedup` is deterministic and the corpus dirs of earlier
  * batches are immutable by then — and overwrites them in place, so the
  * net result is idempotent. The corpus root doubles as a batch_id=N
  * partitioned parquet table; readers see one consistent standing corpus.
  */
object DedupStream {

  /** Inbox CSV schema for document batches: (doc_id, text). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Streaming scan of a document inbox directory (one CSV per batch). */
  def readDocs(spark: SparkSession, inbox: String): DataFrame =
    spark.readStream.schema(docSchema)
      .option("header", "true")
      .csv(inbox)

  /** Seed the standing corpus with an initial document set (batch_id=-1).
    * Must run once before [[screen]] so the corpus root has a schema.
    */
  def seedCorpus(docs: DataFrame, corpusDir: String): Unit =
    docs.select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$corpusDir/batch_id=-1")

  /** One micro-batch of the screen — exposed so the replay property is
    * directly testable. CRASH-REPLAY SAFETY: the corpus read keeps the
    * `batch_id` partition column and filters to batch_id < batchId. A
    * replayed batch (foreachBatch is at-least-once; the JVM can die after
    * the corpus write but before the checkpoint commit) would otherwise
    * see its OWN previous `batch_id=N` output, match every
    * previously-kept doc against itself as an exact dup, and overwrite
    * the partition with an empty kept set — silently losing documents.
    * With the filter, a replay recomputes from exactly the pre-batch-N
    * corpus state and overwrites both outputs with identical rows.
    */
  def screenBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      corpusDir: String, decisionsDir: String, threshold: Double = 0.8): Unit = {
    val b = batch.select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull)
    val corpus = spark.read.parquet(corpusDir)
      .filter(col("batch_id") < batchId)
      .select(col("doc_id"), col("text"))
    val decisions = Dedup.incrementalDedup(b, corpus, threshold)
    decisions.write.mode("overwrite")
      .parquet(s"$decisionsDir/batch_id=$batchId")
    // read back the just-committed decisions so the corpus append is a
    // child of durable state, not of a recomputation that could drift
    val kept = spark.read.parquet(s"$decisionsDir/batch_id=$batchId")
      .filter(col("keep") === 1L).select(col("doc_id"))
    b.join(kept, "doc_id")
      .write.mode("overwrite").parquet(s"$corpusDir/batch_id=$batchId")
    ()
  }

  /** Screen the doc stream against the standing corpus in `corpusDir`.
    * Per batch: decisions (q124 columns + batch_id) land in
    * `decisionsDir/batch_id=N`, and the KEPT docs join the corpus as
    * `corpusDir/batch_id=N` — visible to every later batch, so a doc kept
    * in batch 1 catches its duplicate arriving in batch 7. Within-batch
    * exact dups are caught by `incrementalDedup`'s batch signal.
    */
  def screen(docs: DataFrame, corpusDir: String, decisionsDir: String,
      checkpoint: String, threshold: Double = 0.8): StreamingQuery = {
    // the screen's own state lives in files (corpus/decisions dirs), but
    // default the session's state store anyway so any stateful op composed
    // upstream of `docs` (watermark dedup, sessionization) inherits the
    // RocksDB scale configuration
    StreamIngest.applyStateStoreDefaults(docs.sparkSession)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        screenBatch(batch.sparkSession, batch.toDF(), batchId,
          corpusDir, decisionsDir, threshold)
      }
      .start()
  }
}
