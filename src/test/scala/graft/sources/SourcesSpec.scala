package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import java.nio.file.{Files, Paths}

class SourcesSpec extends AnyFunSuite {

  test("fetchIfMissing downloads once, then skips (fetch_data.py semantics)") {
    val src = Files.createTempFile("graft_src", ".bin")
    Files.writeString(src, "payload-123")
    val dest = Paths.get(Files.createTempDirectory("graft_raw").toString, "raw.bin")
    assert(HttpFetch.fetchIfMissing(src.toUri.toString, dest))
    assert(Files.readString(dest) == "payload-123")
    // second call is an idempotent no-op even if the source changed
    Files.writeString(src, "changed")
    assert(!HttpFetch.fetchIfMissing(src.toUri.toString, dest))
    assert(Files.readString(dest) == "payload-123")
  }

  test("bronze supports the legacy year/month partition layout (test_batch_etl.py:7-11)") {
    import graft.pipeline._
    val base = Files.createTempDirectory("graft_ym").toString
    val cfg = PipelineConfig(
      rawPath = sf0001, bronzePath = s"$base/bronze", silverPath = s"$base/silver",
      artifactsDir = s"$base/a", logsDir = s"$base/l",
      targetPartitions = 2, partitionColumns = Seq("year", "month"))
    BronzeIngest.run(graft.Tables.events(spark, sf0001), cfg)
    val years = new java.io.File(cfg.bronzePath).listFiles().map(_.getName)
    assert(years.exists(_.startsWith("year=")))
    val months = new java.io.File(cfg.bronzePath).listFiles()
      .filter(_.getName.startsWith("year=")).head.listFiles().map(_.getName)
    assert(months.exists(_.startsWith("month=")))
    assert(spark.read.parquet(cfg.bronzePath).count() == 1000L)
  }

  test("approx_count_distinct within 5% of exact (q55)") {
    val rows = graft.queries.Registry.byName("q55_approx_distinct_users")
      .fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"$approx vs $exact")
    }
  }

  test("approx_percentile within 2% of exact (q68)") {
    val rows = graft.queries.Registry.byName("q68_approx_percentiles")
      .fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Double]("p50_approx")
      val exact = r.getAs[Double]("p50_exact")
      assert(math.abs(approx - exact) / exact <= 0.02, s"$approx vs $exact")
    }
  }

  test("approx anomaly screen tracks the exact one (q120 vs q117)") {
    // q120 is q117's sketch scale path: same fit-then-apply shape with
    // approx_percentile fitting the threshold. Per event_type the sketch
    // p99 must sit within 2% of the exact p99, and the exceedance count
    // must stay in the p99 ballpark (<= 2x the nominal 1% tail).
    def byType(name: String) = graft.queries.Registry.byName(name)
      .fn(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("p99_cents"), r.getAs[Long]("n_above")))
      .toMap
    val exact = byType("q117_value_anomaly")
    val approx = byType("q120_value_anomaly_approx")
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (t, (n, p99a, above)) =>
      val (nE, p99e, _) = exact(t)
      assert(n == nE, s"$t row counts diverge: $n vs $nE")
      assert(math.abs(p99a - p99e).toDouble / p99e <= 0.02, s"$t p99 $p99a vs $p99e")
      assert(above <= (n * 0.02).ceil.toLong + 1, s"$t n_above $above of $n")
    }
  }

  test("hash-based exact dedup equals text-based dedup (q56 vs q24)") {
    val byText = graft.queries.Registry.byName("q24_docs_dedup_exact")
      .fn(spark, sf0001).select("keep_id", "n_copies").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byHash = graft.queries.Registry.byName("q56_docs_dedup_by_hash")
      .fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byHash == byText)
  }
}
