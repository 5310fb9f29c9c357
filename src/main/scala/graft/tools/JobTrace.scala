package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool (optimization rounds): run ONE registered query and print one
  * line per Spark job — start offset, wall ms, and the job's callsite /
  * description — so a 200-job query can be read like a profile.
  *
  * Usage: runMain graft.tools.JobTrace <query> [sfDir]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(j.stageInfos.lastOption.map(si =>
            si.name + " rdds=" + si.rddInfos.map(_.name).distinct.take(4)
              .mkString("[", ",", "]")).getOrElse("?"))
        starts.put(j.jobId, (j.time, desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.get(e.jobId)).foreach { case (s, d) =>
          lines.add(f"job=${e.jobId}%4d off=${s - t0.get}%6dms wall=${e.time - s}%5dms  $d")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        if (m != null) {
          val wall = (for { a <- si.completionTime; b <- si.submissionTime }
            yield a - b).getOrElse(-1L)
          lines.add(f"  stage=${si.stageId}%4d tasks=${si.numTasks}%3d wall=${wall}%5dms " +
            f"exec=${m.executorRunTime}%5dms cpu=${m.executorCpuTime / 1000000}%5dms " +
            f"deser=${m.executorDeserializeTime}%4dms gc=${m.jvmGCTime}%4dms " +
            f"fetchWait=${m.shuffleReadMetrics.fetchWaitTime}%4dms " +
            f"sRead=${m.shuffleReadMetrics.totalBytesRead}%8d sWrite=${m.shuffleWriteMetrics.bytesWritten}%8d  ${si.name.takeWhile(_ != ' ')}")
        }
      }
    })

    val fn = graft.SparkEntry.queries(name)
    // warm pass (stored-index builds, JIT)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    System.gc()
    lines.clear()
    t0.set(System.currentTimeMillis())
    val w0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - w0) / 1e9
    Thread.sleep(500) // let listener drain
    import scala.jdk.CollectionConverters._
    lines.asScala.toSeq.sortBy(l => l.drop(4).take(4).trim.toIntOption.getOrElse(0))
      .foreach(println)
    println(f"JOBTRACE $name sec=$sec%.3f n_jobs=${lines.size}")
    spark.stop()
  }
}
