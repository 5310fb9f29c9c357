package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming face of the q164 K-minimum-values sketch: a running
  * DISTINCT-KEY cardinality monitor whose whole state is the K smallest
  * key hashes seen so far — the "how many distinct users/customers/docs
  * has this stream carried" gauge, maintained in O(K) state per stream
  * however many billions of rows pass. The per-batch monitor row carries
  * the batch row count plus the CUMULATIVE estimate, so a consumer sees
  * both volume and the cardinality curve flattening (the dedup-health
  * signal: a stream whose estimate stops moving is re-delivering known
  * keys).
  *
  * Exactness carried over from q164: the estimate `(K-1)*M DIV kth` is
  * pure int64; the merge is EXACT (the K global minima each survive
  * every intermediate K-cut), so after any batch the state equals the
  * sketch a single batch pass over all rows so far would build —
  * KmvStreamSpec pins stream-grown == batch-direct equality, which is
  * the associativity/mergeability proof under real micro-batching.
  *
  * SCALE: the batch-side work is one distinct + TakeOrdered(K) — a
  * per-partition K-heap scan, no full sort anywhere; the merge unions
  * two ≤K-row frames. Exactly-once mirrors [[DriftStream]]: state and
  * monitor rows land whole under `batch_id=N` directories, and a batch
  * is recomputed from the LATEST STATE BELOW its id — so an
  * at-least-once replay of batch N re-reads state N-1 and overwrites
  * identical output, converging instead of double-counting.
  */
object KmvStream {

  /** Sketch size K and the q164/q136 hash modulus (prime, ~2^31). */
  val K = 64
  val M = 2147483629L

  private val stateSchema = StructType(Seq(StructField("h", LongType)))

  /** The q164 multiplicative-mod-prime key hash (injective below M;
    * beyond int64 products the xxhash64 bit-mixing variant applies —
    * the q73/q136 bound family).
    */
  def keyHash(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(key * lit(2654435761L), lit(M))

  /** State-generation directory ids under `stateDir`, listed through
    * the Hadoop FileSystem API (the writers are Spark's Hadoop-FS
    * writers, so the listing must resolve the same filesystem — a
    * java.io.File listing pinned the monitor to the local FS, advisor
    * r13).
    */
  private def stateGens(spark: SparkSession, stateDir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName.stripPrefix("batch_id=").toLong)
  }

  /** The sketch as of the highest recorded batch BELOW `batchId`
    * (empty frame before the first batch) — the replay-safe read point:
    * a re-delivered batch N never sees its own prior output.
    */
  def stateBefore(spark: SparkSession, stateDir: String,
      batchId: Long): DataFrame = {
    val dirs = stateGens(spark, stateDir).filter(_ < batchId)
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], stateSchema)
    else spark.read.schema(stateSchema)
      .parquet(s"$stateDir/batch_id=${dirs.max}")
  }

  /** Drop state generations older than `batchId - 1` once batch
    * `batchId` has fully landed — without this the state dir accumulated
    * one ≤K-row generation per micro-batch FOREVER (advisor r13).
    * Generation N−1 is deliberately KEPT alongside N: foreachBatch is
    * at-least-once, and a replay of batch N (its checkpoint commit
    * lost) re-reads `stateBefore(N)` = generation N−1 — pruning it on
    * OUR write (rather than the checkpoint's commit, which we cannot
    * see) would make the replay recompute from empty state. A replay of
    * batch N−1 itself cannot happen once N has started: starting N
    * proves N−1's checkpoint commit was durable.
    */
  private def pruneStateBefore(spark: SparkSession, stateDir: String,
      batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    stateGens(spark, stateDir).filter(_ < batchId - 1).foreach { g =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/batch_id=$g"), true)
    }
  }

  /** One micro-batch: merge the batch's K minima into the running
    * sketch, persist the new state under `batch_id=N`, emit the monitor
    * row `(n_rows, n_sketch, kth_hash, est_distinct)` under the same
    * keying. Both writes are whole-directory overwrites keyed by
    * batch_id — the DriftStream exactly-once discipline.
    */
  def sketchBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      keyCol: String, stateDir: String, monitorDir: String): Unit = {
    val prev = stateBefore(spark, stateDir, batchId)
    // NULL keys carry no identity and must not enter the sketch: a null
    // hash sorts NULLS FIRST, would take a sketch slot ahead of every
    // real minimum and survive every merge forever (count sees it, max
    // ignores it — the estimate skews permanently). n_rows counts the
    // KEYED rows for the same reason: it is the denominator of the
    // cardinality curve, not a DQ volume gauge (DqChecks owns nulls).
    // One materialization serves both the count and the K-minima pass.
    val keyed = batch.select(keyHash(col(keyCol)).as("h"))
      .filter(col("h").isNotNull).localCheckpoint(true)
    val batchMins = keyed.distinct().orderBy(col("h")).limit(K)
    val merged = prev.unionByName(batchMins).distinct()
      .orderBy(col("h")).limit(K)
      .localCheckpoint(true) // sever from prev's files before overwriting
    merged.coalesce(1).write.mode("overwrite")
      .parquet(s"$stateDir/batch_id=$batchId")
    val nRows = keyed.count()
    keyed.unpersist(blocking = false)
    val agg = merged.agg(count(lit(1)).as("n_sk"), max(col("h")).as("kth"))
      .collect()(0)
    val nSk = agg.getLong(0)
    val kth = if (agg.isNullAt(1)) -1L else agg.getLong(1)
    val est =
      if (nSk < K) nSk
      else (K - 1).toLong * M / kth
    import spark.implicits._
    Seq((nRows, nSk, kth, est))
      .toDF("n_rows", "n_sketch", "kth_hash", "est_distinct")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$monitorDir/batch_id=$batchId")
    merged.unpersist(blocking = false)
    pruneStateBefore(spark, stateDir, batchId)
  }

  /** Start the monitor over a streaming frame: AvailableNow draining,
    * one state generation + one monitor row per micro-batch.
    */
  def monitor(stream: DataFrame, keyCol: String, stateDir: String,
      monitorDir: String, checkpoint: String): StreamingQuery = {
    StreamIngest.applyStateStoreDefaults(stream.sparkSession)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sketchBatch(batch.sparkSession, batch.toDF(), batchId,
          keyCol, stateDir, monitorDir)
      }
      .start()
  }
}
