package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Dev tool (optimization rounds): dump `.explain("formatted")` for the
  * named queries to `<outDir>/<query>_<tag>.txt` and print one line per
  * query with measured wall seconds and the job/stage/scan-stage counts
  * of a single materialization — the "where does the fixed overhead
  * live" view that plan strings alone cannot give for iterative or
  * multi-statement operators (connected components, the q172 lifecycle).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> <query> [query...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val scanStages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
        stages.incrementAndGet()
        scanStages.addAndGet(
          s.stageInfo.rddInfos.count(_.name.contains("FileScanRDD")))
      }
    })

    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm pass: JIT + stored-index builds happen here, as in Bench
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        println(s"WARM-FAIL $name: $e") }
      sweep()
      jobs.set(0); stages.set(0); scanStages.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // plan AFTER the timed run (frame construction may launch jobs for
      // imperative operators; counts above must not include explain's own)
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(f"PLANDUMP $name sec=$sec%.3f jobs=${jobs.get} stages=${stages.get} scanStages=${scanStages.get}")
      sweep()
    }
    spark.stop()
  }
}
