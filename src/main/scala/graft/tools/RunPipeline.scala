package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline._

/** CLI twin of the reference's `run_full_pipeline.ps1`: raw events →
  * bronze (partitioned) → silver (trim/audit) → DQ gate, with per-stage
  * logs, a JSON DQ artifact, and the reference's exit-code policy.
  *
  * Usage: runMain graft.tools.RunPipeline <sfDir> <outBase>
  *          [--warn-only] [--write-silver] [--stage=bronze|silver|dq]
  *
  * `--stage` runs exactly one stage (for external schedulers that want a
  * process boundary per task — see `dags/graft_etl_daily.py`).
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    val stage = args.collectFirst { case a if a.startsWith("--stage=") => a.stripPrefix("--stage=") }
    val sfDir = positional.lift(0).getOrElse("/root/testdata/sf0.001")
    val base  = positional.lift(1).getOrElse("/tmp/graft_pipeline")
    val cfg = PipelineConfig(
      rawPath = sfDir,
      bronzePath = s"$base/bronze/events",
      silverPath = s"$base/silver/events",
      artifactsDir = s"$base/artifacts",
      logsDir = s"$base/logs",
      warnOnly = args.contains("--warn-only"),
      writeSilver = args.contains("--write-silver"))

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outcome = Runner.run(spark, cfg, stage)
    outcome.stages.foreach { s =>
      println(f"stage=${s.name}%-8s ${s.seconds}%6.2fs ${s.metrics.map { case (k, v) => s"$k=$v" }.mkString(" ")} log=${s.logPath}")
    }
    outcome.dqReport.foreach(r => println(s"dq=${r.status} total=${r.total}"))
    val code = outcome.exitCode(cfg.warnOnly)
    println(s"exit=$code")
    spark.stop()
    if (code != 0) sys.exit(code)
  }
}
