package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one registered query at a given sf dir (warm + timed). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // A/B experiments: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" applied on top
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // noop materialization, same as Bench: a count() would let Catalyst
    // prune every computed output column and time a stripped plan
    def mat(): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // sweep between runs, same as Bench: operators may persist/checkpoint
    // bounded intermediates within a query; without the sweep the warm
    // run's blocks stay resident under the timed run (and would also let
    // the timed run read the warm run's cache — timing a cache hit, not
    // the query)
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // this VM's wall-clock is noisy (identical code measured 5.5–13.3 s
    // on q107 across fresh JVMs) — median of in-process reps is the only
    // trustworthy read; --reps N raises the rep count (default 1 timed)
    val reps = args.sliding(2).collectFirst {
      case Array("--reps", n) => n.toInt
    }.getOrElse(1)
    mat() // warm
    val times = (1 to reps).map { _ =>
      sweep()
      System.gc()
      val t0 = System.nanoTime()
      mat()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val med = times(times.size / 2)
    println(f"TIMED $name sec=$med%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    if (args.contains("--explain")) {
      // full-tree view: checkpoint sharing replaces the fact-side subtree
      // with a LogicalRDD leaf — an explain that hides the scans is
      // useless for plan work (r7 advisor; mirrors ScaleGuardSpec.unshared)
      spark.conf.set("spark.graft.orderstats.share", "off")
      try fn(spark, sfDir).explain("formatted")
      finally spark.conf.unset("spark.graft.orderstats.share")
    }
    spark.stop()
  }
}
