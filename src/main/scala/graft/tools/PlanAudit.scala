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
    graft.queries.Registry.all.sortBy(_.name).foreach { q =>
      try {
        val p = q.fn(spark, sfDir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "SortMergeJoin" -> p.contains("SortMergeJoin"),
          "BroadcastNLJoin" -> p.contains("BroadcastNestedLoopJoin"),
          "noCodegen" -> !p.contains("*("))
          .collect { case (f, true) => f }
        println(f"${q.name}%-28s scans=${"FileScan".r.findAllIn(p).length}%2d exchanges=${"Exchange".r.findAllIn(p).length}%2d ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"${q.name} PLAN ERROR: ${e.getMessage.take(100)}") }
    }
    spark.stop()
  }
}
