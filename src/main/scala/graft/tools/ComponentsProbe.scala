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

    // Third experiment (r8 verdict #3): ONE GIANT COMPONENT — the
    // adversarial shape the chain probe misses. A binary tree over half
    // the nodes (edge i — i/2) plus chains of 4 over the rest: the giant
    // half converges to a SINGLE label, so from round 2 on the step
    // join's component-keyed probe carries ~N/2 rows under one key — the
    // hottest possible key for `stepped.join(parents, "component")`. The
    // skew listener reports, for the worst stage of the run, the max
    // task's shuffle-read rows against the stage mean: that ratio is the
    // direct measure of whether the hot label melts one task.
    val skew = new GiantSkewListener(spark)
    for (mode <- Seq("off", "on")) {
      spark.conf.set("spark.graft.components.copartition", mode)
      val giantEdges = spark.range(1, bigN / 2)
        .select(col("id").as("doc_a"), (col("id") / 2).cast("long").as("doc_b"))
        .union(spark.range(bigN / 2, bigN)
          .filter(col("id") % 4 =!= 3)
          .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b")))
        .localCheckpoint(true)
      var rounds = 0
      skew.reset()
      val t0 = System.nanoTime()
      val comps = Dedup.connectedComponents(giantEdges, roundProbe = r => rounds = r)
      val hist = comps.groupBy(col("component")).count()
        .agg(max(col("count")), count(lit(1))).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      Dedup.release(comps)
      Dedup.release(giantEdges)
      println(f"PROBE-GIANT n=$bigN%8d copartition=$mode%-3s " +
        f"biggest=${hist.getLong(0)}%8d components=${hist.getLong(1)}%8d " +
        f"rounds=$rounds%2d sec=$sec%7.2f ${skew.report()}")
    }
    spark.conf.unset("spark.graft.components.copartition")
    spark.stop()
  }
}

/** Tracks per-task shuffle-read record counts per stage and reports the
  * stage with the worst max/mean ratio (min 8 tasks, so tiny result
  * stages don't dominate the report).
  */
final class GiantSkewListener(spark: SparkSession)
    extends org.apache.spark.scheduler.SparkListener {
  private val byStage =
    scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[Long]]()
  spark.sparkContext.addSparkListener(this)

  override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
    if (t.taskMetrics != null) synchronized {
      byStage.getOrElseUpdate(t.stageId, scala.collection.mutable.ArrayBuffer())
        .append(t.taskMetrics.shuffleReadMetrics.recordsRead)
    }

  def reset(): Unit = synchronized(byStage.clear())

  def report(): String = {
    org.apache.spark.sql.graft.bridge.drainListenerBus(spark)
    synchronized {
      val candidates = byStage.toSeq.collect {
        case (sid, rows) if rows.size >= 8 && rows.sum > 0 =>
          val mx = rows.max.toDouble
          val mean = rows.sum.toDouble / rows.size
          (sid, mx / mean, rows.max, rows.size)
      }
      if (candidates.isEmpty) "skew=none"
      else {
        val (sid, ratio, mx, n) = candidates.maxBy(_._2)
        f"worstStage=$sid maxTaskRows=$mx tasks=$n maxOverMean=$ratio%.1f"
      }
    }
  }
}
