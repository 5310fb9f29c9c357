package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Lexical

/** Streaming maintenance of the STORED lexical (BM25) index — the
  * fifth index family under the one AnnStream/DedupStream discipline:
  * each document micro-batch computes its OWN postings/doclen/stats
  * slices (pure integer functions of the batch text — no frozen model
  * state to read back) and appends them under the batch's `batch_id`
  * partition, append-if-absent probed PER TABLE so an at-least-once
  * replay fills exactly the missing slices and a pre-compaction replay
  * is fenced by `compacted_through`. A document ingested in batch N is
  * BM25-retrievable from batch N+1 on, at O(|delta|) cost per batch.
  */
object LexStream {

  /** One micro-batch of lexical-index maintenance. Malformed rows (NULL
    * id/text) are dropped — the DedupStream contract (the filter itself
    * lives in [[Lexical.lexIndexSlices]], shared with the batch build).
    *
    * An EMPTY filtered batch appends NOTHING (advisor r14): the stats
    * slice is an agg without groupBy, so it would land a 1-row n_docs=0
    * partition while the empty postings/doclen appends create no
    * partition at all — and `stats` sits in compaction's exact
    * batch-alignment set, so that asymmetry would block
    * `compactLexIndex` with a "postings missing batch N" no replay can
    * heal (the replay re-appends nothing). A 0-row batch contributes
    * nothing to any probe; ABSENCE is the consistent representation
    * across all three tables. The emptiness probe is one limit-1 job on
    * the already-filtered micro-batch.
    */
  def indexBatchLex(spark: SparkSession, batch: DataFrame, batchId: Long,
      tablePrefix: String): Unit = {
    val b = batch.select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    if (b.limit(1).isEmpty) return
    val (postings, doclen, stats) = Lexical.lexIndexSlices(b, batchId)
    AnnStream.appendAbsent(spark, tablePrefix, batchId,
      Map("postings" -> postings, "doclen" -> doclen, "stats" -> stats))
  }

  /** The streaming lexical-index maintainer: AvailableNow over a
    * document stream (DedupStream.docSchema inbox), idempotent
    * batch_id-keyed appends via [[indexBatchLex]]. Seed the index first
    * (`Lexical.buildLexIndex` — batch_id -1); after a restart,
    * re-attach (`Lexical.reattachLexIndex`) before starting the stream.
    */
  def maintainLex(docs: DataFrame, tablePrefix: String,
      checkpoint: String): StreamingQuery = {
    StreamIngest.applyStateStoreDefaults(docs.sparkSession)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        indexBatchLex(batch.sparkSession, batch.toDF(), batchId, tablePrefix)
      }
      .start()
  }
}
