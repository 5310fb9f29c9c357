package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Dev tool: audit every registered query for scale-hostile shapes
  * (cartesian products, unexpected sort-merge joins of tiny dims, lost
  * codegen) and record its scan behavior — committed per round as
  * PLANAUDIT_r*.txt so plan regressions show as one-line diffs.
  *
  * Two views per query, because checkpoints lie to plan strings (r7
  * verdict: the committed audit showed q46 scans=0 while the whole point
  * of its OrderStats rewrite was "one fact scan"):
  *
  *  - EXECUTION truth (`execScans`): a SparkListener counts FileScanRDD
  *    occurrences across the stages ACTUALLY submitted while the query
  *    builds and runs under default confs. This sees through shared
  *    checkpoints (OrderStats) and — unlike any static plan — through
  *    iterative operators (connected components), whose per-round scans
  *    happen in jobs no final plan references. One FileScanRDD feeding
  *    two stages counts twice (files are read twice); a stage skipped by
  *    shuffle reuse counts zero (they are not).
  *  - PLAN shape (`scans`/`exchanges`/flags): the final AQE physical plan
  *    as shipped (ckpt = checkpoint leaves it reads), plus `fullScans`
  *    from a second frame built under spark.graft.orderstats.share=off —
  *    the UNSHARED logical tree, where the fact-side subtree a checkpoint
  *    hides is visible to the CartesianProduct sweep (mirrors
  *    ScaleGuardSpec.unshared; construction is free of jobs now that the
  *    checkpoint is deferred).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scanStages = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        scanStages.addAndGet(s.stageInfo.rddInfos.count(_.name.contains("FileScanRDD")))
    }
    spark.sparkContext.addSparkListener(listener)

    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val lines = graft.queries.Registry.all.sortBy(_.name).map { q =>
      try {
        org.apache.spark.sql.graft.bridge.drainListenerBus(spark)
        scanStages.set(0)
        val qe = q.fn(spark, sfDir).queryExecution
        // execute THIS QueryExecution first (a noop write would plan a
        // separate one): pre-execution, AQE wraps everything in
        // AdaptiveSparkPlan with no codegen markers and tentative join
        // picks — the audit must read the FINAL runtime plan
        // (isFinalPlan=true), which is also where AQE's SMJ->BHJ rewrites
        // and coalesced exchanges actually show
        qe.executedPlan.execute().count()
        org.apache.spark.sql.graft.bridge.drainListenerBus(spark)
        val execScans = scanStages.get()
        // unwrap to the FINAL physical plan only: the adaptive wrapper's
        // toString renders final AND initial trees, double-counting every
        // scan/exchange
        val p = qe.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan.toString
          case other => other.toString
        }
        // full-tree pass: rebuild with checkpoint sharing off so hidden
        // subtrees are visible; plan-only (never executed)
        spark.conf.set("spark.graft.orderstats.share", "off")
        val full =
          try q.fn(spark, sfDir).queryExecution.executedPlan.toString
          finally spark.conf.unset("spark.graft.orderstats.share")
        // AQE empty-relation propagation: a query whose result is empty at
        // this sf collapses its FINAL plan to EmptyRelation leaves —
        // joins, scans, and codegen markers vanish from `p`. Flag that
        // explicitly instead of letting it masquerade as noCodegen (the
        // q143-at-sf0.001 shape); the `full` pre-execution tree still
        // carries the real join/scan structure for the other flags.
        val emptyCollapsed = p.contains("EmptyRelation")
        val flags = Seq(
          "CartesianProduct" -> (p.contains("CartesianProduct") || full.contains("CartesianProduct")),
          "SortMergeJoin" -> p.contains("SortMergeJoin"),
          "BroadcastNLJoin" -> p.contains("BroadcastNestedLoopJoin"),
          "emptyCollapsed" -> emptyCollapsed,
          "noCodegen" -> (!p.contains("*(") && !emptyCollapsed))
          .collect { case (f, true) => f }
        f"${q.name}%-28s execScans=$execScans%2d scans=${"FileScan".r.findAllIn(p).length}%2d ckpt=${"Scan ExistingRDD".r.findAllIn(p).length}%2d fullScans=${"FileScan".r.findAllIn(full).length}%2d exchanges=${"Exchange".r.findAllIn(p).length}%2d ${flags.mkString(",")}"
      } catch { case e: Throwable => s"${q.name} PLAN ERROR: ${e.getMessage.take(100)}" }
      finally sweep()
    }
    lines.foreach(println)
    // persist the summary so each round can commit it (PLANAUDIT_r*.txt) —
    // a plan regression (new exchange, lost codegen, join flip) then shows
    // up as a one-line diff in review without rerunning anything
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get("target/planaudit.txt"),
      lines.mkString("", "\n", "\n"))
    spark.stop()
  }
}
