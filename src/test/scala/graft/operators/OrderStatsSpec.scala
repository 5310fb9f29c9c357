package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark

/** Direct unit tests for the OrderStats decomposition (r6 shipped it
  * covered only indirectly through the q46/q78 oracle hashes). Every
  * entry point is compared against a plain-Scala reference computed from
  * the same rows — an engine-independent oracle — on hand-built edge
  * cases and seeded random data:
  *   - clamped lo queries (halfWidth >= min value, so v-hw-1 goes
  *     negative and the -1 clamp path runs),
  *   - empty buckets between populated ones,
  *   - halfWidth not a multiple of bucketWidth,
  *   - quantile ties / duplicate values,
  *   - bucketWidth 1 (every distinct value its own bucket) and a band
  *     wider than the whole domain (C(hi) saturates at n_total),
  *   - single-value groups and multi-measure cumAt.
  */
class OrderStatsSpec extends AnyFunSuite {
  import spark.implicits._

  // ---- plain-Scala references ---------------------------------------

  /** inclusive cumulative count/sum per distinct (part, v) */
  private def refCum(rows: Seq[(String, Long)]): Map[(String, Long), (Long, Long)] =
    rows.groupBy(_._1).flatMap { case (p, grp) =>
      val vs = grp.map(_._2)
      vs.distinct.map { v =>
        val le = vs.filter(_ <= v)
        (p, v) -> ((le.size.toLong, le.sum))
      }
    }

  /** percentile_disc: smallest value at rank ceil(q*n), 1-indexed */
  private def refPct(vs: Seq[Long], num: Long, den: Long): Long = {
    val s = vs.sorted
    val k = ((s.size * num + den - 1) / den).toInt // ceil, exact ints
    s(k - 1)
  }

  /** count/sum of group rows within [v-hw, v+hw] */
  private def refBand(vs: Seq[Long], v: Long, hw: Long): (Long, Long) = {
    val in = vs.filter(x => x >= v - hw && x <= v + hw)
    (in.size.toLong, in.sum)
  }

  private def df(rows: Seq[(String, Long)]): DataFrame =
    rows.toDF("part", "v")

  // hand-built: ties, empty buckets between data (0..9 | gap | 100..),
  // one single-value group, values straddling bucket boundaries
  private val edge: Seq[(String, Long)] = Seq(
    "a" -> 0L, "a" -> 0L, "a" -> 3L, "a" -> 9L, "a" -> 10L, "a" -> 100L,
    "a" -> 100L, "a" -> 100L, "a" -> 101L,
    "b" -> 7L, "b" -> 7L, "b" -> 7L, // single distinct value
    "c" -> 0L, "c" -> 1000L) // maximal gap
  private val seeded: Seq[(String, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(400)((s"g${rnd.nextInt(3)}", rnd.nextInt(500).toLong))
  }

  test("distinctCum matches the per-distinct-value reference (edge + random, W=10 and W=1)") {
    for (rows <- Seq(edge, seeded); w <- Seq(10L, 1L)) {
      val got = OrderStats
        .distinctCum(df(rows), Seq("part"), "v", col("v"), w,
          Seq("n" -> count(lit(1)), "vsum" -> sum(col("v"))))
        .select("part", "v", "cum_n", "cum_vsum")
        .as[(String, Long, Long, Long)].collect()
      val want = refCum(rows)
      assert(got.length == want.size)
      got.foreach { case (p, v, cn, cs) =>
        assert((cn, cs) == want((p, v)), s"cum at ($p,$v), W=$w")
      }
    }
  }

  test("percentilesDisc matches the rank-pick reference incl. ties and q=1") {
    val qs = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p90", 9L, 10L), ("p100", 1L, 1L))
    for (rows <- Seq(edge, seeded); w <- Seq(10L, 64L)) {
      val got = OrderStats
        .percentilesDisc(df(rows), Seq("part"), "v", col("v"), w, qs)
        .select(col("part"), col("p25").cast("long"), col("p50").cast("long"),
          col("p90").cast("long"), col("p100").cast("long"))
        .as[(String, Long, Long, Long, Long)].collect()
      val byPart = rows.groupBy(_._1)
      got.foreach { case (p, p25, p50, p90, p100) =>
        val vs = byPart(p).map(_._2)
        assert(p25 == refPct(vs, 1, 4), s"$p p25 W=$w")
        assert(p50 == refPct(vs, 1, 2), s"$p p50 W=$w")
        assert(p90 == refPct(vs, 9, 10), s"$p p90 W=$w")
        assert(p100 == refPct(vs, 1, 1), s"$p p100 W=$w")
      }
    }
  }

  test("cumAt answers arbitrary query points, multi-measure, incl. x below all data") {
    // query points: on a value, between values (empty-bucket gap), below
    // everything (-1 clamp shape), above everything
    val queries = Seq(
      ("a", -1L), ("a", 0L), ("a", 5L), ("a", 9L), ("a", 55L), ("a", 101L), ("a", 999L),
      ("b", 6L), ("b", 7L), ("c", 500L), ("c", 1000L))
      .toDF("part", "x")
    val got = OrderStats
      .cumAt(df(edge), Seq("part"), "v", 10L,
        Seq("n" -> count(lit(1)), "vsum" -> sum(col("v"))), queries, "x")
      .select("part", "x", "cum_n", "cum_vsum")
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == 11)
    val byPart = edge.groupBy(_._1)
    got.foreach { case (p, x, cn, cs) =>
      val le = byPart(p).map(_._2).filter(_ <= x)
      assert((cn, cs) == ((le.size.toLong, le.sum)), s"C($p,$x)")
    }
  }

  test("bandCountSum matches the RANGE-frame reference; clamp, odd widths, whole-domain band") {
    // hw=7 with W=10 exercises halfWidth not a multiple of bucketWidth;
    // hw=9 >= min value 0 forces the negative lo clamp on every low value;
    // hw=10000 makes the band swallow the whole domain (C(hi)=n_total)
    for (rows <- Seq(edge, seeded); hw <- Seq(7L, 9L, 100L, 10000L)) {
      val got = OrderStats
        .bandCountSum(df(rows), Seq("part"), "v", halfWidth = hw, bucketWidth = 10L)
        .select("part", "v", "n_band", "sum_band")
        .as[(String, Long, Long, Long)].collect()
      val byPart = rows.groupBy(_._1)
      got.foreach { case (p, v, n, s) =>
        assert((n, s) == refBand(byPart(p).map(_._2), v, hw), s"band($p,$v) hw=$hw")
      }
      assert(got.length == rows.map(r => (r._1, r._2)).distinct.size)
    }
  }

  test("shared checkpoint is DEFERRED: building + explaining launches zero jobs") {
    // r7 verdict #2: the old lazy localCheckpoint executed the fact-scan
    // stages at frame CONSTRUCTION under AQE, so explain-only tools that
    // forgot the share=off conf silently ran jobs (PlanAudit tripped it).
    // Pin the fix: constructing the operator frames and rendering their
    // plans must submit no Spark jobs at all.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val pct = OrderStats.percentilesDisc(df(edge), Seq("part"), "v", col("v"),
        bucketWidth = 10L, quantiles = Seq(("p50", 1L, 2L)))
      val band = OrderStats.bandCountSum(df(edge), Seq("part"), "v", 9L, 10L)
      pct.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      band.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      org.apache.spark.sql.graft.bridge.drainListenerBus(spark)
      assert(jobs.get() == 0,
        s"building/explaining OrderStats frames launched ${jobs.get()} jobs — checkpoint no longer deferred")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("release: back-to-back calls return the persistent-RDD set to baseline") {
    // r7 advisor: a library caller looping percentilesDisc accumulated one
    // domain-bounded checkpoint per call with no way to free them (the
    // returned frames have join/agg roots, which Dedup-style ownership
    // release correctly refuses to traverse). OrderStats.release frees
    // the operator's own deferred checkpoints through any derived frame.
    def persisted(): Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val baseline = persisted()
    for (_ <- 1 to 2) {
      val pct = OrderStats.percentilesDisc(df(seeded), Seq("part"), "v", col("v"),
        bucketWidth = 10L, quantiles = Seq(("p50", 1L, 2L), ("p99", 99L, 100L)))
      pct.write.format("noop").mode("overwrite").save()
      OrderStats.release(pct)
      assert(persisted() == baseline,
        s"leaked persistent RDDs: ${(persisted() -- baseline).mkString(",")}")
    }
  }

  test("release is restartable: a released frame recomputes, same answer, no crash") {
    // the deferred checkpoint keeps its origin plan, so release() on a
    // frame that is later re-used degrades to a recompute — NOT the
    // "checkpoint block not found" failure of freeing a plain
    // localCheckpoint. This is what makes release()'s join-traversing
    // blast radius safe for sibling frames off one distinctCum result.
    val pct = OrderStats.percentilesDisc(df(edge), Seq("part"), "v", col("v"),
      bucketWidth = 10L, quantiles = Seq(("p50", 1L, 2L)))
    val first = pct.orderBy("part").collect().toSeq
    OrderStats.release(pct)
    val again = pct.orderBy("part").collect().toSeq
    assert(again == first, "recompute after release changed the answer")
  }
}
