package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Throughput check at the reference's actual input scale (~3.07M rows, the
  * NYC taxi 2023-01 file): replicate the sf0.1 events table to ~3M rows,
  * then time the full bronze → silver → DQ pipeline on it.
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val sfDir = pos.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = pos.lift(1).map(_.toInt).getOrElse(30)
    val base = pos.lift(2).getOrElse("/tmp/graft_pipebench")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // build the 3M-row raw input (not timed): k replicas with distinct ids
    val ev = graft.Tables.events(spark, sfDir)
    val big = ev.crossJoin(spark.range(copies).toDF("rep"))
      .withColumn("event_id", col("event_id") * copies + col("rep"))
      .drop("rep")
      // raw shape: ts as int64 nanos, matching the driver's raw events file
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000)
    big.write.mode("overwrite").parquet(s"$base/raw/events.parquet")
    val n = spark.read.parquet(s"$base/raw/events.parquet").count()

    val cfg = PipelineConfig(
      rawPath = s"$base/raw",
      bronzePath = s"$base/bronze", silverPath = s"$base/silver",
      artifactsDir = s"$base/artifacts", logsDir = s"$base/logs",
      targetPartitions = 32, shufflePartitions = 32,
      repartitionByPartitionCols = args.contains("--by-partition"))
    val t0 = System.nanoTime()
    val outcome = Runner.run(spark, cfg)
    val secs = (System.nanoTime() - t0) / 1e9
    outcome.stages.foreach(s => println(f"stage=${s.name}%-8s ${s.seconds}%6.2fs"))
    println(f"PIPEBENCH rows=$n total=${secs}%.2fs throughput=${n / secs / 1e6}%.2fM rows/s dq=${outcome.dqReport.map(_.status).getOrElse("?")}")
    spark.stop()
  }
}
