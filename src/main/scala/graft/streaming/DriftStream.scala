package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Drift

/** Streaming face of the drift monitors (q141/q142's batch shapes):
  * every micro-batch's value distribution is scored against a STATIC
  * reference window — PSI over fixed Laplace-smoothed buckets
  * ([[monitor]]) or exact two-sample KS on the floor grid
  * ([[monitorKs]]) — and one `(score_micros, n_rows, alert)` row lands
  * under `monitorDir/batch_id=N`: the ingest guard that catches an
  * upstream unit change, a source gone silent, or a schema drift
  * arriving as individually-valid rows, BEFORE the batch is admitted
  * downstream. An EMPTY batch always alerts: smoothing makes it look
  * uniform to PSI and degenerate-zero to KS, so the silent-source case
  * is decided on the row count, not the divergence.
  *
  * SCALE: the per-batch cost is one map-side-combined aggregate of the
  * batch into `nBuckets` counts (constant-size state at any batch size —
  * the reference side's counts are equally bounded), then a driver read
  * of the single summed PSI row: the same shape q141 runs over 100 TB,
  * here amortized per batch. Exactly-once mirrors [[DedupStream]]:
  * output is keyed by `batch_id` and overwritten whole, so an
  * at-least-once foreachBatch replay rewrites identical rows (the
  * reference frame is static and the score deterministic).
  */
object DriftStream {

  /** One micro-batch of the monitor — exposed so the replay property is
    * directly testable. The monitor row is written under its own
    * `batch_id=N` directory (partition-style layout, no duplicated
    * batch_id data column), so `spark.read.parquet(monitorDir)` yields
    * the full monitor table with `batch_id` as a partition column.
    */
  def monitorBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      ref: DataFrame, valueCol: String, lo: Double, hi: Double,
      nBuckets: Int, alertMicros: Long, monitorDir: String): Unit = {
    val counts = Drift.bucketCounts(ref, batch, valueCol, lo, hi, nBuckets)
    // single bounded driver read (nBuckets rows reduced to one) — the
    // DqChecks one-agg-row pattern, not a data collect
    val row = counts.agg(
      sum(expr(Drift.psiMicrosExpr)).as("psi_micros"),
      sum(col("cur_n")).as("n_rows")).collect()(0)
    val (psi, n) = (row.getLong(0), row.getLong(1))
    // n == 0 must alert REGARDLESS of PSI: Laplace smoothing makes an
    // empty current window look exactly UNIFORM (qn=1/qd=nBuckets per
    // bucket), so against a near-uniform reference a silent source
    // scores PSI ~ 0 — the one upstream failure the divergence itself
    // cannot see
    import spark.implicits._
    Seq((psi, n, psi > alertMicros || n == 0L))
      .toDF("psi_micros", "n_rows", "alert")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$monitorDir/batch_id=$batchId")
  }

  /** One micro-batch of the KS monitor (q142's streaming face): the
    * batch's values against the static reference on the shared
    * `floor(value)` grid — D = max|cumBatch·nRef − cumRef·nBatch| /
    * (nBatch·nRef) in integer micros, int64-exact numerator, the one
    * division canonicalized exactly as q142's oracle does it. Same
    * bounded-state argument (the cumulative window sorts the grid, not
    * the data) and the same empty-batch rule: n == 0 alerts regardless
    * (an empty side makes D degenerate-zero by convention here, and a
    * silent source is precisely what must not pass).
    */
  def monitorKsBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      ref: DataFrame, valueCol: String, alertMicros: Long,
      monitorDir: String): Unit = {
    val tagged = batch.select(col(valueCol), lit(true).as("__cur"))
      .unionByName(ref.select(col(valueCol), lit(false).as("__cur")))
    // CASE-guard the one division: an empty side makes it 0/0, which
    // ANSI mode raises as DIVIDE_BY_ZERO rather than yielding NaN
    val row = Drift.ksCounts(tagged, valueCol, col("__cur"))
      .select(when(col("n_a") > 0 && col("n_b") > 0,
          expr(Drift.ksMicrosExpr)).otherwise(lit(0L)).as("ks_micros"),
        col("n_a").as("n_rows")).collect()(0)
    // both-sides-empty grid yields an all-NULL aggregate row; a silent
    // source against a nonempty reference yields ks_num=0 with ta=0
    // (NaN division cast to 0) — either way the n==0 alert decides
    val (ks, n) = (if (row.isNullAt(0)) 0L else row.getLong(0),
      if (row.isNullAt(1)) 0L else row.getLong(1))
    import spark.implicits._
    Seq((ks, n, ks > alertMicros || n == 0L))
      .toDF("ks_micros", "n_rows", "alert")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$monitorDir/batch_id=$batchId")
  }

  /** Start the monitor over a streaming frame: AvailableNow draining,
    * one monitor row per micro-batch. `ref` is the static reference
    * window (e.g. last week's accepted values); `alertMicros` is the
    * PSI alert bar in integer micros (the industry 0.25 rule-of-thumb
    * is 250000).
    */
  def monitor(stream: DataFrame, ref: DataFrame, valueCol: String,
      lo: Double, hi: Double, nBuckets: Int, alertMicros: Long,
      monitorDir: String, checkpoint: String): StreamingQuery = {
    StreamIngest.applyStateStoreDefaults(stream.sparkSession)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        monitorBatch(batch.sparkSession, batch.toDF(), batchId,
          ref, valueCol, lo, hi, nBuckets, alertMicros, monitorDir)
      }
      .start()
  }

  /** KS variant of [[monitor]]: bucket-free (no lo/hi/nBuckets dial —
    * the quantized grid is the data's own floor values), sensitive to
    * location shifts PSI's fixed buckets can blur; `alertMicros` is the
    * D bar in integer micros.
    */
  def monitorKs(stream: DataFrame, ref: DataFrame, valueCol: String,
      alertMicros: Long, monitorDir: String,
      checkpoint: String): StreamingQuery = {
    StreamIngest.applyStateStoreDefaults(stream.sparkSession)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        monitorKsBatch(batch.sparkSession, batch.toDF(), batchId,
          ref, valueCol, alertMicros, monitorDir)
      }
      .start()
  }
}
