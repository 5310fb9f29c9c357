package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, sf0001}

/** Z-order layout must (a) preserve the data exactly, (b) give narrow
  * per-file footer ranges on EVERY clustered column — the multi-column
  * skipping a single-axis sort cannot provide — and (c) the key itself
  * must be a correct bit interleave.
  */
class ZorderSpec extends AnyFunSuite {

  private def files(p: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
  }

  /** avg per-file (max-min) span of `c`, normalized by the global span. */
  private def relSpan(path: String, c: String): Double = {
    val spans = files(path).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(c).cast("double")), max(col(c).cast("double"))).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val global = spans.map(_._2).max - spans.map(_._1).min
    spans.map { case (lo, hi) => hi - lo }.sum / spans.size / global
  }

  test("interleave is an exact Morton encode") {
    // rank pair (x=0b0011, y=0b0101) with 4 bits -> key bits y3x3 y2x2 y1x1 y0x0
    // = 0b01_00_10_01_11 pairs: (x0=1,y0=1)->11, (x1=1,y1=0)->01, (x2=0,y2=1)->10, (x3=0,y3=0)->00
    val row = spark.range(1)
      .select(Zorder.interleave(Seq(lit(3L), lit(5L)), 4).as("z"))
      .head()
    // positions: x bit b -> 2b, y bit b -> 2b+1
    // x=0011: bits 0,1 set -> positions 0,2; y=0101: bits 0,2 set -> positions 1,5
    assert(row.getLong(0) == ((1L << 0) | (1L << 2) | (1L << 1) | (1L << 5)))
  }

  test("z-order clustering: both columns get narrow per-file ranges; plain sort does not") {
    val base = Files.createTempDirectory("graft_zorder").toString
    val events = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("value"))

    Zorder.cluster(events, Seq("user_id", "value"), numFiles = 8)
      .write.parquet(s"$base/zorder")
    // baseline: single-axis sort on value only
    events.repartitionByRange(8, col("value"))
      .sortWithinPartitions(col("value"))
      .write.parquet(s"$base/valsort")

    // data preserved exactly
    assert(spark.read.parquet(s"$base/zorder").count() == events.count())
    assert(spark.read.parquet(s"$base/zorder")
      .agg(sum(col("event_id"))).head().getLong(0) ==
      events.agg(sum(col("event_id"))).head().getLong(0))

    val zUser = relSpan(s"$base/zorder", "user_id")
    val zVal = relSpan(s"$base/zorder", "value")
    val sUser = relSpan(s"$base/valsort", "user_id")
    val sVal = relSpan(s"$base/valsort", "value")
    // z-order: every clustered column skips (each file covers a fraction
    // of both ranges); the 8-file split gives ~2 top z-bits per dim
    assert(zUser <= 0.75, s"zorder user_id rel span $zUser")
    assert(zVal <= 0.75, s"zorder value rel span $zVal")
    // single-axis sort: perfect on its own column, useless on the other
    assert(sVal <= 0.3, s"value-sorted value rel span $sVal")
    assert(sUser >= 0.8, s"value-sorted user_id rel span $sUser — " +
      "baseline unexpectedly clustered; weak comparison")
    // and z-order's second column beats the baseline's by a wide margin
    assert(zUser < sUser / 2)
  }

  test("constant column degrades gracefully (rank 0, key driven by the rest)") {
    val df = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), lit(7L).as("k"), col("value"))
    val out = Zorder.cluster(df, Seq("k", "value"), numFiles = 4)
    assert(out.count() == df.count())
  }
}
