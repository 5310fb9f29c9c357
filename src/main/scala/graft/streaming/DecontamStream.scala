package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Decontam

/** Streaming face of eval-set decontamination (the q143 audit + q147
  * span policy as an INGEST GUARD): every micro-batch of incoming
  * training documents is screened against a STORED benchmark-gram index
  * before it lands — flagged, span-budgeted, and rewritten with the
  * contaminated spans excised, so downstream consumers only ever see
  * decontaminated text.
  *
  * The eval side is a real benchmark suite: MBs, fixed, built ONCE
  * ([[buildEvalIndex]] — distinct gram hashes only, no text). Per batch
  * the cost is O(|batch| windows) grams joined against that small index
  * — the size-based pick lands it as a broadcast build side (the q143
  * plan argument), so the batch's exploded grams never shuffle.
  *
  * Exactly-once: the DedupStream discipline — output keyed by batch_id,
  * one overwritten directory per batch; screening is deterministic and
  * reads only the immutable eval index, so an at-least-once replay
  * rewrites identical rows in place. Unlike DedupStream there is no
  * standing-state append at all, so there is no cross-table crash
  * window to reconcile.
  */
object DecontamStream {

  /** Stored-index layout marker — bump on any layout change so a stale
    * index fails loudly instead of silently matching nothing.
    */
  val IndexFormat = 1

  /** Build the stored eval-gram index: the DISTINCT n-gram hashes of the
    * benchmark corpus (no positions, no text — the index cannot leak the
    * benchmark itself into the pipeline) under `indexDir/grams`, plus a
    * 1-row `indexDir/meta` recording the gram size `n` and the layout
    * format. The meta row exists because n is independently overridable
    * on both build and screen: screening an n=13 index with n=10 grams
    * would match NOTHING and wave every contaminated doc through — the
    * worst failure mode for an ingest guard — so [[screenBatch]] asserts
    * the recorded n instead of trusting the caller. Run once per
    * benchmark drop.
    */
  def buildEvalIndex(evalDocs: DataFrame, indexDir: String, n: Int = 13): Unit = {
    val spark = evalDocs.sparkSession
    import spark.implicits._
    Decontam.grams(evalDocs, n).select(col("h")).distinct()
      .write.mode("overwrite").parquet(s"$indexDir/grams")
    Seq((IndexFormat, n)).toDF("format", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/meta")
  }

  /** Validated-index memo keyed by (session, indexDir, n): the meta read,
    * the require checks, and the grams.isEmpty Spark job ran on EVERY
    * micro-batch — avoidable latency on the ingest hot path, since the
    * index is immutable for the life of a screen (rebuilds are a new
    * indexDir or a new session). Keying on the session means a restarted
    * JVM re-validates from files, so the memo can never outlive the
    * storage it vouches for.
    */
  private val validatedIndexes = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Int), java.lang.ref.SoftReference[DataFrame]]()

  /** Load + validate the stored index: the meta row must exist, carry the
    * current format, and record the SAME n the screen is about to use;
    * the gram set must be non-empty. Every violation throws — an ingest
    * safety guard must never degrade to a silent no-op screen. Validation
    * runs once per (session, indexDir, n); later batches reuse the
    * validated frame ([[validatedIndexes]]). The key is the session UUID
    * string and the value a SoftReference (advisor r12): the old
    * session-object key pinned stopped sessions — and their frames — for
    * the JVM lifetime; now the only strong path to a dead session is a
    * soft one the collector clears under pressure, and a cleared entry
    * just re-validates (cheap: a meta read + an isEmpty probe).
    */
  private def loadEvalIndex(spark: SparkSession, indexDir: String, n: Int): DataFrame = {
    val key = (graft.Tables.sessionKey(spark), indexDir, n)
    Option(validatedIndexes.get(key)).flatMap(r => Option(r.get())).getOrElse {
      val df = loadEvalIndexUncached(spark, indexDir, n)
      validatedIndexes.put(key, new java.lang.ref.SoftReference(df))
      df
    }
  }

  private def loadEvalIndexUncached(spark: SparkSession, indexDir: String, n: Int): DataFrame = {
    val meta =
      try spark.read.parquet(s"$indexDir/meta").collect()
      catch {
        case e: Exception => throw new IllegalStateException(
          s"eval-gram index at $indexDir has no readable meta — rebuild with buildEvalIndex", e)
      }
    require(meta.length == 1, s"eval-gram index meta at $indexDir must be exactly 1 row, got ${meta.length}")
    val fmt = meta(0).getAs[Int]("format")
    val storedN = meta(0).getAs[Int]("n")
    require(fmt == IndexFormat,
      s"eval-gram index format $fmt != expected $IndexFormat — rebuild with buildEvalIndex")
    require(storedN == n,
      s"eval-gram index was built with n=$storedN but the screen is running with n=$n — " +
        "the gram join would match nothing and contaminated docs would pass as clean; " +
        "rebuild the index or screen with the recorded n")
    // an all-short benchmark writes ZERO part files (nothing to infer a
    // schema from), so the read itself can throw — same verdict: empty
    val grams =
      try spark.read.parquet(s"$indexDir/grams")
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"eval-gram index at $indexDir is empty or unreadable — screening against it " +
            "would be a no-op; rebuild from a benchmark corpus with docs of >= n tokens", e)
      }
    require(!grams.isEmpty,
      s"eval-gram index at $indexDir is empty — screening against it is a no-op; " +
        "rebuild from a benchmark corpus with docs of >= n tokens")
    grams
  }

  /** One micro-batch of the screen — exposed so replay and batch-parity
    * properties are directly testable. Emits one row per input doc:
    * (doc_id, contaminated, n_spans, tokens_removed, n_tokens,
    * clean_text) where clean docs pass through with their original text
    * and contaminated docs carry the span-scrubbed rewrite (the q147
    * budget columns + the applied policy in one artifact).
    */
  def screenBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      evalIndexDir: String, outDir: String, n: Int = 13): Unit = {
    // malformed inbox rows (missing id or text) are dropped, not passed
    // through with NULL arithmetic — the DedupStream contract
    val b = batch.select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    val evalIndex = loadEvalIndex(spark, evalIndexDir, n)
    val hits = Decontam.grams(b, n).join(evalIndex, "h")
      .select(col("doc_id"), col("i"))
    val spans = Decontam.mergedSpans(hits, n)
    val budget = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("hi") - col("lo") + 1).cast("long").as("tokens_removed"))
    Decontam.scrubText(b, spans)
      .join(budget, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_spans").isNotNull.cast("long").as("contaminated"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        col("clean_text"))
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    ()
  }

  /** The streaming screen: AvailableNow over a document stream,
    * idempotent batch_id-keyed decisions via [[screenBatch]].
    */
  def screen(docs: DataFrame, evalIndexDir: String, outDir: String,
      checkpoint: String, n: Int = 13): StreamingQuery = {
    StreamIngest.applyStateStoreDefaults(docs.sparkSession)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        screenBatch(batch.sparkSession, batch.toDF(), batchId,
          evalIndexDir, outDir, n)
      }
      .start()
  }
}
