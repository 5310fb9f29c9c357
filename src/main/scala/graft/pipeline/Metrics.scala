package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.nio.file.{Files, Paths}

/** Query-level observability (completing O1's per-step logging at the
  * engine layer): a QueryExecutionListener recording duration and output
  * rows for every action on the session, dumpable as a JSONL artifact next
  * to the DQ summaries. At scale this is the hook where shuffle-bytes /
  * spill metrics from `executedPlan.metrics` get exported.
  */
object Metrics {

  final case class QueryMetric(
      action: String, durationMs: Long, outputRows: Option[Long], failed: Boolean)

  final class Recorder extends QueryExecutionListener {
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[QueryMetric]()

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      buf.add(QueryMetric(funcName, durationNs / 1000000L,
        qe.executedPlan.metrics.get("numOutputRows").map(_.value), failed = false))

    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
      buf.add(QueryMetric(funcName, 0L, None, failed = true))

    def entries: Seq[QueryMetric] = {
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq
    }
  }

  def attach(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r)
    r
  }

  def detach(spark: SparkSession, r: Recorder): Unit =
    spark.listenerManager.unregister(r)

  def dump(r: Recorder, path: String): String = {
    Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
    val lines = r.entries.map { m =>
      s"""{"action":"${m.action}","duration_ms":${m.durationMs},""" +
        s""""output_rows":${m.outputRows.map(_.toString).getOrElse("null")},"failed":${m.failed}}"""
    }
    Files.writeString(Paths.get(path), lines.mkString("", "\n", "\n"))
    path
  }
}
