package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Evidence for the stored-index claim: incremental dedup against the
  * bucketed corpus index costs O(|delta| + matched postings), while the
  * recompute path re-shingles the corpus every batch — so the gap must
  * WIDEN linearly with corpus size. Measures both paths on the sf
  * documents split (corpus = q73 buckets 0–79, delta = 80–99), then on
  * a corpus replicated `copies`× with salted tokens (the
  * ComponentsProbe replication trick: per-replica token renames keep
  * the structure while sharing no shingles), same delta.
  *
  * Index build time is reported separately — it amortizes over every
  * later batch, which is the whole point.
  */
object StoredIndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_sidx_probe_wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }

    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .withColumn("bucket", pmod(col("doc_id") * lit(2654435761L), lit(100)))
    val corpus1 = docs.filter(col("bucket") < 80).select(col("doc_id"), col("text"))
    val delta = docs.filter(col("bucket") >= 80).select(col("doc_id"), col("text"))

    for ((k, corpus) <- Seq(1 -> corpus1,
        copies -> corpus1.crossJoin(spark.range(copies).toDF("rep"))
          .select((col("doc_id") * copies + col("rep")).as("doc_id"),
            array_join(transform(split(col("text"), " "),
              t => concat(lit("r"), col("rep"), lit("_"), t)), " ").as("text")))) {
      // parquet-backed, NOT a localCheckpoint: the sweep below unpersists
      // every persistent RDD (the Bench invariant), which would brick a
      // checkpointed corpus between measurements
      val corpusPath = s"/tmp/graft_sidx_probe/corpus_x$k"
      corpus.write.mode("overwrite").parquet(corpusPath)
      val corpusC = spark.read.parquet(corpusPath)
      val nCorpus = corpusC.count()
      val prefix = s"probe_x$k"
      val buildSec = timed {
        Dedup.buildCorpusIndex(corpusC, prefix, s"/tmp/graft_sidx_probe/x$k")
      }
      sweep()
      // warmup both paths once, then measure median-of-3
      def recompute(): Unit = noop(Dedup.incrementalDedup(delta, corpusC, 0.8))
      def stored(): Unit = noop(Dedup.incrementalDedupStored(delta, prefix, 0.8))
      recompute(); sweep(); stored(); sweep()
      def med3(f: () => Unit): Double = {
        val ts = (1 to 3).map { _ => val t = timed(f()); sweep(); t }
        ts.sorted.apply(1)
      }
      val rSec = med3(recompute _)
      val sSec = med3(stored _)
      println(f"SIDXPROBE corpus=$nCorpus%8d delta-batch recompute=$rSec%6.2f s  stored=$sSec%6.2f s  ratio=${sSec / rSec}%.2f  (index build $buildSec%5.1f s, amortized)")
      for (t <- Seq(s"${prefix}_postings", s"${prefix}_sizes", s"${prefix}_exact"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
    spark.stop()
  }
}
