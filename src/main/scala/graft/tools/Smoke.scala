package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke: drives SparkEntry.entry exactly like the driver's t1 check. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"SMOKE entry rows=$n (${if (n > 0) "OK" else "FAIL"})")
    spark.stop()
  }
}
