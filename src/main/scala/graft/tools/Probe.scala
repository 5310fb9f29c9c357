package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: can Spark 4.1 read the driver testdata (esp. ns timestamps)? */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.show(3, truncate = false)
    } catch {
      case e: Throwable => println(s"DIRECT READ FAILED: ${e.getMessage}")
        try {
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          val ev2 = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          ev2.printSchema()
          ev2.show(3, truncate = false)
        } catch { case e2: Throwable => println(s"LEGACY READ FAILED: ${e2.getMessage}") }
    }
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.printSchema()
    spark.stop()
  }
}
