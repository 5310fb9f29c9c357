package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Drift

/** Streaming face of the drift monitors (q141's batch shape): every
  * micro-batch's value distribution is scored against a STATIC reference
  * window, and one `(psi_micros, n_rows, alert)` row lands under
  * `monitorDir/batch_id=N` — the ingest guard that catches an upstream
  * unit change, a source gone silent, or a schema drift arriving as
  * individually-valid rows, BEFORE the batch is admitted downstream.
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
    import spark.implicits._
    Seq((psi, n, psi > alertMicros))
      .toDF("psi_micros", "n_rows", "alert")
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
}
