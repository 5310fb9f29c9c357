package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Clustering

/** Dev diagnostic for the IVF coarse quantizer (r10 verdict #1): for a
  * query's exact top-k neighbors, measure how many land in the query's
  * nProbe nearest lists under different quantizers — seeded vs Lloyd
  * iterations, dot-product vs L2 assignment, spherical (renormalized)
  * vs plain means — plus list-population balance. Driver-side math over
  * one collected embedding table (a probe, not an operator).
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val embs = graft.Tables.embeddings(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    val queryIds = embs.map(_._1).sorted.take(20)
    val topOf: Map[Long, Set[Long]] = queryIds.map { qid =>
      val q = embs.find(_._1 == qid).get._2
      qid -> embs.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(v, q)) }
        .sortBy(c => (-c._2, c._1)).take(10).map(_._1).toSet
    }.toMap

    def assignIdx(v: Array[Double], cs: Seq[Array[Double]], l2: Boolean): Int =
      cs.zipWithIndex.map { case (c, i) =>
        val s = if (l2) dot(v, c) - dot(c, c) / 2 else dot(v, c)
        (s, -i)
      }.max match { case (_, negi) => -negi }

    def eval(tag: String, cs: Seq[Array[Double]], l2: Boolean): Unit = {
      val asg = embs.map { case (id, v) => (id, assignIdx(v, cs, l2)) }.toMap
      val sizes = asg.values.groupBy(identity).view.mapValues(_.size).toMap
      for (nProbe <- Seq(2, 4, 6, 8)) {
        val recalls = queryIds.map { qid =>
          val q = embs.find(_._1 == qid).get._2
          val probes = cs.indices.map { i =>
            val s = if (l2) dot(q, cs(i)) - dot(cs(i), cs(i)) / 2 else dot(q, cs(i))
            (s, -i)
          }.sorted.reverse.take(nProbe).map { case (_, negi) => -negi }.toSet
          topOf(qid).count(id => probes.contains(asg(id))) / 10.0
        }
        val mean = recalls.sum / recalls.size
        val min = recalls.min
        println(f"$tag%-22s nProbe=$nProbe meanRecall=$mean%.3f minRecall=$min%.2f")
      }
      val ss = (0 until cs.size).map(i => sizes.getOrElse(i, 0))
      println(s"$tag list sizes: min=${ss.min} max=${ss.max}")
    }

    val seeded = Clustering.centroids(16, 64, seed = 7L).map(_.toArray)
    eval("seeded dot", seeded, l2 = false)
    eval("seeded l2", seeded, l2 = true)
    for (iters <- Seq(2, 5)) {
      val learned = Clustering.fitCentroids(
        graft.Tables.embeddings(spark, sfDir), 16, 64, iters, seed = 7L)
        .map(_.toArray)
      eval(s"lloyd$iters dot", learned, l2 = false)
      eval(s"lloyd$iters l2", learned, l2 = true)
      // spherical: renormalize the learned means (cosine-space k-means)
      val sph = learned.map { c =>
        val n = math.sqrt(dot(c, c)); c.map(_ / n)
      }
      eval(s"lloyd$iters spherical", sph, l2 = false)
    }
    spark.stop()
  }
}
