package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Measures the r8 verdict's q138 nit: the dedup-report query rebuilds
  * the whole shingle→pairs→components pipeline that q87 just ran. The
  * registered queries must stay independent (driver contract; the Bench
  * sweep unpersists between queries), so the sharing surface is the
  * PIPELINE shape: compute components once, derive both the decisions
  * table (q87) and the size report (q138) from the same materialized
  * frame. This probe times independent vs shared on a given sfDir so the
  * decision is recorded on numbers ("only land it if the bench moves" —
  * the q124 discipline).
  */
object SharedComponentsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // warmup
    noop(Dedup.dedupDecisions(docs, 0.8)); sweep()

    val independent = median((1 to reps).map { _ =>
      val t = timed {
        noop(Dedup.dedupDecisions(docs, 0.8).orderBy(col("doc_id"))) // q87
        noop(Dedup.componentSizeReport(Dedup.connectedComponents(    // q138
          Dedup.shingleJaccardPairs(docs, 0.8).select(col("doc_a"), col("doc_b")))))
      }
      sweep(); t
    })

    val shared = median((1 to reps).map { _ =>
      val t = timed {
        val comps = Dedup.connectedComponents(
          Dedup.shingleJaccardPairs(docs, 0.8).select(col("doc_a"), col("doc_b")))
        // comps is checkpoint-backed: both consumers read the same blocks
        noop(comps
          .withColumn("keep", (col("doc_id") === col("component")).cast("long"))
          .orderBy(col("doc_id")))
        noop(Dedup.componentSizeReport(comps))
        Dedup.release(comps)
      }
      sweep(); t
    })

    println(f"SHAREDPROBE sf=$sfDir reps=$reps independent=$independent%.2f shared=$shared%.2f ratio=${shared / independent}%.2f")
    spark.stop()
  }
}
