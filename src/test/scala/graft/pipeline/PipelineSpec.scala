package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import java.nio.file.Files

class PipelineSpec extends AnyFunSuite {

  private def tmpCfg(): PipelineConfig = {
    val base = Files.createTempDirectory("graft_pipe").toString
    PipelineConfig(
      rawPath = sf0001,
      bronzePath = s"$base/bronze",
      silverPath = s"$base/silver",
      artifactsDir = s"$base/artifacts",
      logsDir = s"$base/logs",
      targetPartitions = 4,
      shufflePartitions = 4,
      silverPartitions = 2)
  }

  test("normalizeName matches reference semantics (batch_etl.py:43)") {
    assert(BronzeIngest.normalizeName("  Tpep Pickup Datetime ") == "tpep_pickup_datetime")
    assert(BronzeIngest.normalizeName("already_ok") == "already_ok")
  }

  test("deriveDate falls back and enforces the contract (batch_etl.py:46-54)") {
    import spark.implicits._
    val withTs = Seq(("2024-01-02 03:04:05")).toDF("ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val d1 = BronzeIngest.deriveDate("ts", "event_date")(withTs)
    assert(d1.select("event_date").collect()(0).getDate(0).toString == "2024-01-02")

    val withDate = Seq("2024-01-02").toDF("event_date")
    val d2 = BronzeIngest.deriveDate("ts", "event_date")(withDate)
    assert(d2.schema("event_date").dataType.typeName == "date")

    val neither = Seq(1).toDF("x")
    intercept[IllegalArgumentException] {
      BronzeIngest.deriveDate("ts", "event_date")(neither)
    }
  }

  test("bronze write produces hive partition dirs (batch_etl.py:76-81)") {
    val cfg = tmpCfg()
    val raw = graft.Tables.events(spark, cfg.rawPath)
    val metrics = BronzeIngest.run(raw, cfg)
    assert(metrics("rows") == 1000L)
    val dirs = new java.io.File(cfg.bronzePath).listFiles().map(_.getName)
    assert(dirs.count(_.startsWith("event_date=")) > 5)
    // round-trip: partition column survives and rows are intact
    val back = spark.read.parquet(cfg.bronzePath)
    assert(back.count() == 1000L)
    assert(back.columns.contains("event_date"))
  }

  test("bronze partition layout enables partition pruning (batch_etl.py:75 'good for pruning')") {
    val cfg = tmpCfg()
    BronzeIngest.run(graft.Tables.events(spark, cfg.rawPath), cfg)
    val pruned = spark.read.parquet(cfg.bronzePath)
      .filter(col("event_date") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("event_date"), plan)
    // the pruned scan must touch exactly the one partition's rows
    assert(pruned.count() == graft.Tables.events(spark, cfg.rawPath)
      .filter(to_date(col("ts")) === "2024-01-05").count())
  }

  test("silver trims strings, drops _cols, adds audit (write_silver.py:26-36)") {
    import spark.implicits._
    val df = Seq((" padded ", 1, "x")).toDF("s", "n", "_tmp")
    val out = SilverClean.transform(df)
    assert(out.columns.toSet == Set("s", "n", "silver_loaded_at"))
    assert(out.select("s").as[String].collect()(0) == "padded")
  }

  test("DQ single-pass counts equal per-rule filter counts (dq_checks.py:56-59)") {
    val ev = graft.Tables.events(spark, sf0001)
    val rules = DqChecks.eventRules(DqThresholds())
    val report = DqChecks.evaluate(ev, rules)
    rules.foreach { r =>
      val direct = ev.filter(r.predicate).count()
      assert(report.results.find(_.name == r.name).get.violations == direct,
        s"rule ${r.name}")
    }
    assert(report.total == 1000L)
  }

  test("DQ evaluate survives an empty DataFrame (empty micro-batch after restart)") {
    val ev = graft.Tables.events(spark, sf0001).filter(lit(false))
    val rules = DqChecks.eventRules(DqThresholds())
    val report = DqChecks.evaluate(ev, rules) // sum(when) is NULL over 0 rows — must not NPE
    assert(report.total == 0L)
    assert(report.results.forall(_.violations == 0L))
    assert(report.passed)
  }

  test("clean + distinct violations partition the input (F6 algebra)") {
    val ev = graft.Tables.events(spark, sf0001)
    val rules = DqChecks.eventRules(DqThresholds())
    val anyViolation = rules.map(_.predicate).reduce(_ || _)
    val nClean = DqChecks.clean(ev, rules).count()
    val nViol = ev.filter(anyViolation).count()
    assert(nClean + nViol == 1000L)
  }

  test("structural DQ: uniqueness and referential integrity are clean on testdata") {
    val row = graft.queries.Registry.byName("q66_dq_structural")
      .fn(spark, sf0001).collect()(0)
    assert(row.getAs[Long]("n_dup_event_id") == 0L)
    assert(row.getAs[Long]("n_orphan_orders") == 0L)
    assert(row.getAs[Long]("n_orphan_lineitems") == 0L)
    // and the operators actually detect violations on corrupted data
    import spark.implicits._
    val dup = Seq(1L, 1L, 2L).toDF("event_id")
    assert(DqChecks.uniquenessViolations(dup, "event_id")
      .collect()(0).getLong(0) == 1L)
    val child = Seq(10L, 99L).toDF("fk")
    val parent = Seq(10L).toDF("pk")
    assert(DqChecks.orphanCount(child, parent, "fk", "pk", "n")
      .collect()(0).getLong(0) == 1L)
  }

  test("metrics listener records action durations and output rows") {
    val rec = Metrics.attach(spark)
    try {
      graft.Tables.events(spark, sf0001).count()
      val deadline = System.currentTimeMillis() + 30000
      while (rec.entries.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(rec.entries.nonEmpty)
      assert(rec.entries.exists(e => e.action == "count" && !e.failed))
      val path = Files.createTempDirectory("graft_metrics").toString + "/metrics.jsonl"
      Metrics.dump(rec, path)
      val body = new String(Files.readAllBytes(java.nio.file.Paths.get(path)))
      assert(body.contains("\"action\":\"count\""))
    } finally Metrics.detach(spark, rec)
  }

  test("full runner: stages, logs, artifact, exit codes (run_full_pipeline.ps1)") {
    val cfg = tmpCfg().copy(writeSilver = true,
      thresholds = DqThresholds(earlyDropoff = 0, longDistance = 0,
        negativeValues = 0, invalidPassengers = 0))
    val outcome = Runner.run(spark, cfg)
    assert(outcome.stages.map(_.name) == Seq("bronze", "silver", "dq"))
    assert(outcome.failedStage.isEmpty)
    // events has 'error' rows, so rule error_events(threshold=0) must fail
    assert(outcome.dqReport.exists(!_.passed))
    assert(outcome.exitCode(warnOnly = false) == 2) // dq_checks.py:119-120
    assert(outcome.exitCode(warnOnly = true) == 0)
    // per-stage logs exist (run_full_pipeline.ps1:116-124)
    val logs = new java.io.File(cfg.logsDir).listFiles().map(_.getName)
    assert(Seq("bronze", "silver", "dq").forall(s => logs.exists(_.startsWith(s"step_$s"))))
    // artifact exists and is valid-ish JSON (dq_checks.py:80-99)
    val arts = new java.io.File(cfg.artifactsDir).listFiles()
    assert(arts.nonEmpty)
    val body = new String(Files.readAllBytes(arts.head.toPath))
    assert(body.contains("\"status\": \"FAILED\""))
    // cleaned silver written behind the flag (dq_checks.py:102-114)
    assert(new java.io.File(cfg.silverPath + "_clean").exists())
  }

  test("gold layer: written after a passing DQ gate, skipped after a failing one") {
    val pass = DqThresholds(negativeValues = 10000, earlyDropoff = 10000,
      longDistance = 10000, invalidPassengers = 10000)
    val cfgOk = tmpCfg().copy(writeGold = true, thresholds = pass)
    val okOutcome = Runner.run(spark, cfgOk)
    assert(okOutcome.stages.map(_.name) == Seq("bronze", "silver", "dq", "gold"))
    assert(okOutcome.exitCode(warnOnly = false) == 0)
    val gold = spark.read.parquet(cfgOk.goldPath)
    assert(gold.columns.sorted.toSeq ==
      Seq("avg_value", "event_date", "event_type", "n_events", "n_users", "total_value"))
    assert(gold.count() > 0)
    // one partition dir per event_date → daily overwrite + consumer pruning
    assert(new java.io.File(cfgOk.goldPath).listFiles()
      .exists(_.getName.startsWith("event_date=")))

    val cfgBad = tmpCfg().copy(writeGold = true,
      thresholds = DqThresholds(0, 0, 0, 0))
    val badOutcome = Runner.run(spark, cfgBad)
    assert(badOutcome.stages.map(_.name) == Seq("bronze", "silver", "dq"))
    assert(badOutcome.exitCode(warnOnly = false) == 2) // DQ code not masked
    assert(!new java.io.File(cfgBad.goldPath).exists())
  }

  test("single-stage runs compose into the full pipeline (O3 DAG task boundaries)") {
    val cfg = tmpCfg()
    // three separate invocations, as dags/graft_etl_daily.py schedules them —
    // stages hand off purely through the bronze/silver paths
    for (stage <- Runner.stageNames) {
      val outcome = Runner.run(spark, cfg, only = Some(stage))
      assert(outcome.stages.map(_.name) == Seq(stage))
      assert(outcome.failedStage.isEmpty, s"stage $stage failed")
    }
    // the final dq-only run produced a report over the silver built earlier
    val lastDq = Runner.run(spark, cfg, only = Some("dq"))
    assert(lastDq.dqReport.exists(_.total == 1000L))
    intercept[IllegalArgumentException] {
      Runner.run(spark, cfg, only = Some("nope"))
    }
  }
}
