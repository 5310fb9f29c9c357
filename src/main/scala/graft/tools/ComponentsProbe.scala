package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scale probe for the connected-components family (q87/q88/q107's
  * engine): pointer jumping promises ~O(log diameter) rounds and ~linear
  * wall-time in the edge count — prove it on data, not argument, by
  * running the same near-dup graph at 1x and REPLICAS x.
  *
  * Replication salts every TOKEN per replica (`r<k>_<token>`), a
  * bijective rename of the shingle alphabet: each replica reproduces the
  * original's near-dup structure exactly while sharing zero shingles
  * with any other, so the k-fold corpus is k disjoint copies of the
  * graph — components multiply by k, diameters are unchanged, and a
  * healthy run shows round count FLAT and seconds ~linear. (Naive
  * replication with identical text would instead weld each document's k
  * copies into a clique — a k²-edge graph that measures pair blowup,
  * not components scaling.)
  *
  * Pairs are materialized to parquet and read back before timing so the
  * probe times label propagation, not shingling.
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val base = args.lift(2).getOrElse("/tmp/graft_compprobe")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    for (k <- Seq(1, copies)) {
      val d =
        if (k == 1) docs
        else docs.crossJoin(spark.range(k).toDF("rep"))
          .withColumn("doc_id", col("doc_id") * k + col("rep"))
          .withColumn("text", array_join(
            transform(split(col("text"), " "),
              t => concat(lit("r"), col("rep"), lit("_"), t)), " "))
          .drop("rep")
      val pairsPath = s"$base/pairs_x$k"
      Dedup.shingleJaccardPairs(d, threshold = 0.8)
        .select(col("doc_a"), col("doc_b"))
        .write.mode("overwrite").parquet(pairsPath)
      val pairs = spark.read.parquet(pairsPath)
      val nEdges = pairs.count()
      var rounds = 0
      val t0 = System.nanoTime()
      val comps = Dedup.connectedComponents(pairs, roundProbe = r => rounds = r)
      val nComps = comps.select(col("component")).distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      Dedup.release(comps)
      println(f"PROBE copies=$k%2d edges=$nEdges%8d components=$nComps%6d rounds=$rounds%2d sec=$sec%7.2f")
    }

    // Second experiment: the co-partitioned checkpoint path (adaptive in
    // connectedComponents, forced here) against the plain path on a graph
    // big enough that labels CANNOT broadcast — the regime the adaptive
    // switch targets. Chains of 4 nodes mirror real dedup graphs (many
    // tiny components, small diameter): nodes 0..N-1, edge i→i+1 unless
    // i % 4 == 3, so N/4 components of diameter 3 and ~0.75N edges.
    val bigN = args.lift(3).map(_.toLong).getOrElse(4000000L)
    val bigEdges = spark.range(bigN)
      .filter(col("id") % 4 =!= 3)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      .localCheckpoint(true)
    for (mode <- Seq("off", "on")) {
      spark.conf.set("spark.graft.components.copartition", mode)
      var rounds = 0
      val t0 = System.nanoTime()
      val comps = Dedup.connectedComponents(bigEdges, roundProbe = r => rounds = r)
      val nComps = comps.select(col("component")).distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      Dedup.release(comps)
      println(f"PROBE-BIG n=$bigN%8d copartition=$mode%-3s components=$nComps%8d rounds=$rounds%2d sec=$sec%7.2f")
    }
    spark.conf.unset("spark.graft.components.copartition")
    Dedup.release(bigEdges) // the probe's own checkpoint hygiene rule
    spark.stop()
  }
}
