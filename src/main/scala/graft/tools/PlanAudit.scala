package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump every registered query's physical plan and flag
  * scale-hostile shapes (cartesian products, unexpected sort-merge joins of
  * tiny dims, missing pushdown).
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
    val lines = graft.queries.Registry.all.sortBy(_.name).map { q =>
      try {
        val qe = q.fn(spark, sfDir).queryExecution
        // execute THIS QueryExecution first (a noop write would plan a
        // separate one): pre-execution, AQE wraps everything in
        // AdaptiveSparkPlan with no codegen markers and tentative join
        // picks — the audit must read the FINAL runtime plan
        // (isFinalPlan=true), which is also where AQE's SMJ->BHJ rewrites
        // and coalesced exchanges actually show
        qe.executedPlan.execute().count()
        // unwrap to the FINAL physical plan only: the adaptive wrapper's
        // toString renders final AND initial trees, double-counting every
        // scan/exchange
        val p = qe.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan.toString
          case other => other.toString
        }
        val flags = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "SortMergeJoin" -> p.contains("SortMergeJoin"),
          "BroadcastNLJoin" -> p.contains("BroadcastNestedLoopJoin"),
          "noCodegen" -> !p.contains("*("))
          .collect { case (f, true) => f }
        f"${q.name}%-28s scans=${"FileScan".r.findAllIn(p).length}%2d exchanges=${"Exchange".r.findAllIn(p).length}%2d ${flags.mkString(",")}"
      } catch { case e: Throwable => s"${q.name} PLAN ERROR: ${e.getMessage.take(100)}" }
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
