package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestSession.spark
import java.sql.Timestamp

class StatefulSpec extends AnyFunSuite {

  test("mapGroupsWithState accumulates per-user totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double, String)]
    val df = mem.toDF().toDF("user_id", "value", "event_type")
    val q = StatefulOps.runningUserTotals(df)
      .writeStream.format("memory").queryName("state_test")
      .outputMode("update").start()

    mem.addData((1L, 10.0, "view"), (1L, 5.0, "error"), (2L, 1.0, "view"))
    q.processAllAvailable()
    val after1 = spark.table("state_test").collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(after1(1L).getAs[Long]("n_events") == 2L)
    assert(after1(1L).getAs[Double]("total_value") == 15.0)
    assert(after1(1L).getAs[Long]("n_errors") == 1L)

    // batch 2: state must carry over, not reset
    mem.addData((1L, 7.0, "view"))
    q.processAllAvailable()
    val rows = spark.table("state_test").collect()
      .filter(_.getAs[Long]("user_id") == 1L)
      .map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
    q.stop()
    assert(rows.contains((3L, 22.0))) // 2 prior events + 1 new, totals accumulated
  }

  test("event-time sessionizer emits completed sessions when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    def t(s: String) = Timestamp.valueOf(s)
    val q = StatefulOps.completedSessions(df, gap = "30 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions_done")
      .outputMode("append").start()
    // user 1: two events 5 min apart = one session
    mem.addData((1L, t("2024-01-01 10:00:00"), 2.0), (1L, t("2024-01-01 10:05:00"), 3.0))
    q.processAllAvailable()
    // a much later event advances the watermark past 10:35 → session times out
    mem.addData((2L, t("2024-01-01 12:00:00"), 1.0))
    q.processAllAvailable()
    mem.addData((2L, t("2024-01-01 12:00:30"), 1.0)) // extra batch to flush timeouts
    q.processAllAvailable()
    val rows = spark.table("sessions_done").collect()
      .filter(_.getAs[Long]("user_id") == 1L)
    q.stop()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_events") == 2L)
    assert(rows.head.getAs[Double]("total_value") == 5.0)
    assert(rows.head.getAs[Timestamp]("session_start") == t("2024-01-01 10:00:00"))
    assert(rows.head.getAs[Timestamp]("session_end") == t("2024-01-01 10:05:00"))
  }

  test("out-of-order in-watermark rows lower session_start on merge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    def t(s: String) = Timestamp.valueOf(s)
    // generous watermark delay so the second (earlier) event is still
    // admitted a batch after the session was opened at a later timestamp
    val q = StatefulOps.completedSessions(df, gap = "30 minutes", watermark = "2 hours")
      .writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").start()
    mem.addData((1L, t("2024-01-01 10:05:00"), 2.0))
    q.processAllAvailable()
    mem.addData((1L, t("2024-01-01 10:00:30"), 3.0)) // earlier than stored start
    q.processAllAvailable()
    // advance the watermark far past end+gap, then one more batch to flush
    mem.addData((9L, t("2024-01-01 14:00:00"), 1.0))
    q.processAllAvailable()
    mem.addData((9L, t("2024-01-01 14:01:00"), 1.0))
    q.processAllAvailable()
    val rows = spark.table("sessions_ooo").collect()
      .filter(_.getAs[Long]("user_id") == 1L)
    q.stop()
    assert(rows.length == 1)
    assert(rows.head.getAs[Timestamp]("session_start") == t("2024-01-01 10:00:30"))
    assert(rows.head.getAs[Timestamp]("session_end") == t("2024-01-01 10:05:00"))
    assert(rows.head.getAs[Long]("n_events") == 2L)
    assert(rows.head.getAs[Double]("total_value") == 5.0)
  }

  test("transformWithState twin matches mapGroupsWithState totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Double, String)]
      val df = mem.toDF().toDF("user_id", "value", "event_type")
      val q = StatefulOps.runningUserTotalsTws(df)
        .writeStream.format("memory").queryName("tws_test")
        .outputMode("update").start()
      mem.addData((1L, 10.0, "view"), (1L, 5.0, "error"), (2L, 1.0, "view"))
      q.processAllAvailable()
      mem.addData((1L, 7.0, "view"))
      q.processAllAvailable()
      val rows = spark.table("tws_test").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
        .map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"),
          r.getAs[Long]("n_errors")))
      q.stop()
      // same emissions as the mapGroupsWithState version in the test above
      assert(rows.contains((2L, 15.0, 1L)))
      assert(rows.contains((3L, 22.0, 1L)))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("a later batch's bridging row reunites provisionally-split sessions (no premature emit)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    def t(s: String) = Timestamp.valueOf(s)
    val q = StatefulOps.completedSessions(df, gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions_bridge")
      .outputMode("append").start()
    // 10:00 and 10:31 are 31 min apart — provisionally two sessions, but
    // neither may be emitted yet: an in-watermark middle row could still
    // arrive and merge them
    mem.addData((1L, t("2024-01-01 10:00:00"), 1.0), (1L, t("2024-01-01 10:31:00"), 2.0))
    q.processAllAvailable()
    // 10:25 is >= the 10:21 watermark and within gap of BOTH — one true session
    mem.addData((1L, t("2024-01-01 10:25:00"), 4.0))
    q.processAllAvailable()
    mem.addData((9L, t("2024-01-01 13:00:00"), 1.0))
    q.processAllAvailable()
    mem.addData((9L, t("2024-01-01 13:01:00"), 1.0))
    q.processAllAvailable()
    val rows = spark.table("sessions_bridge").collect()
      .filter(_.getAs[Long]("user_id") == 1L)
    q.stop()
    assert(rows.length == 1, s"expected one reunited session, got ${rows.length}")
    assert(rows.head.getAs[Timestamp]("session_start") == t("2024-01-01 10:00:00"))
    assert(rows.head.getAs[Timestamp]("session_end") == t("2024-01-01 10:31:00"))
    assert(rows.head.getAs[Long]("n_events") == 3L)
    assert(rows.head.getAs[Double]("total_value") == 7.0)
  }

  test("transformWithState sessionizer matches the GroupState twin on the bridge scenario") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, Double)]
      val df = mem.toDF().toDF("user_id", "ts", "value")
      def t(s: String) = Timestamp.valueOf(s)
      val q = StatefulOps.completedSessionsTws(df, gap = "30 minutes", watermark = "10 minutes")
        .writeStream.format("memory").queryName("sessions_tws")
        .outputMode("append").start()
      mem.addData((1L, t("2024-01-01 10:00:00"), 1.0), (1L, t("2024-01-01 10:31:00"), 2.0))
      q.processAllAvailable()
      mem.addData((1L, t("2024-01-01 10:25:00"), 4.0)) // bridges the provisional split
      q.processAllAvailable()
      mem.addData((9L, t("2024-01-01 13:00:00"), 1.0))
      q.processAllAvailable()
      mem.addData((9L, t("2024-01-01 13:01:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_tws").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
      q.stop()
      assert(rows.length == 1, s"expected one reunited session, got ${rows.length}")
      assert(rows.head.getAs[Timestamp]("session_start") == t("2024-01-01 10:00:00"))
      assert(rows.head.getAs[Timestamp]("session_end") == t("2024-01-01 10:31:00"))
      assert(rows.head.getAs[Long]("n_events") == 3L)
      assert(rows.head.getAs[Double]("total_value") == 7.0)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("a very-late row beyond the gap forms its own earlier session, not a bridged one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    def t(s: String) = Timestamp.valueOf(s)
    val q = StatefulOps.completedSessions(df, gap = "30 minutes", watermark = "6 hours")
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    mem.addData((1L, t("2024-01-01 12:00:00"), 1.0))
    q.processAllAvailable()
    // 4 hours earlier, still in-watermark: a 2h+ silent gap must NOT be
    // bridged into one [08:00, 12:00] session
    mem.addData((1L, t("2024-01-01 08:00:00"), 2.0))
    q.processAllAvailable()
    // flush: advance watermark far past 12:30
    mem.addData((9L, t("2024-01-02 12:00:00"), 1.0))
    q.processAllAvailable()
    mem.addData((9L, t("2024-01-02 12:01:00"), 1.0))
    q.processAllAvailable()
    val rows = spark.table("sessions_late").collect()
      .filter(_.getAs[Long]("user_id") == 1L)
      .map(r => (r.getAs[Timestamp]("session_start"), r.getAs[Timestamp]("session_end"),
        r.getAs[Long]("n_events")))
      .sortBy(_._1.getTime)
    q.stop()
    assert(rows.toSeq == Seq(
      (t("2024-01-01 08:00:00"), t("2024-01-01 08:00:00"), 1L),
      (t("2024-01-01 12:00:00"), t("2024-01-01 12:00:00"), 1L)))
  }

  test("flatMapGroupsWithState variant runs and emits updates (timeout path compiles+executes)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double, String)]
    val df = mem.toDF().toDF("user_id", "value", "event_type")
    val q = StatefulOps.expiringUserTotals(df, idleTimeout = "1 hour")
      .writeStream.format("memory").queryName("state_exp_test")
      .outputMode("update").start()
    mem.addData((5L, 2.0, "view"), (5L, 3.0, "view"))
    // ProcessingTimeTimeout keeps the query scheduling batches, so
    // processAllAvailable never quiesces — poll the sink with a deadline
    val deadline = System.currentTimeMillis() + 60000
    var rows = Array.empty[org.apache.spark.sql.Row]
    while (rows.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(250)
      rows = spark.table("state_exp_test").collect()
    }
    q.stop()
    assert(rows.exists(r => r.getAs[Long]("user_id") == 5L &&
      r.getAs[Long]("n_events") == 2L && r.getAs[Double]("total_value") == 5.0))
  }

  test("RocksDB is the stateful default and absorbs large key cardinality") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prior = spark.conf.getOption(provKey)
    spark.conf.unset(provKey)
    try {
      val mem = MemoryStream[(Long, Timestamp)]
      val df = mem.toDF().toDF("event_id", "ts")
      // the entry point itself must flip the session to the scale default
      val deduped = StreamIngest.dedupWithinWatermark(df, watermark = "10 minutes")
      assert(spark.conf.get(provKey).contains("RocksDBStateStoreProvider"))
      assert(spark.conf.get(changelogKey) == "true")
      val q = deduped.writeStream.format("memory").queryName("rocksdb_dedup")
        .outputMode("append").start()
      // 100k distinct keys + a 50% duplicate tail across two batches: far
      // beyond what the tiny-state tests exercise, and every key lives in
      // RocksDB state until its watermark expires
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData((0L until 100000L).map(i => (i, t0)))
      q.processAllAvailable()
      mem.addData((0L until 50000L).map(i => (i, t0)))
      q.processAllAvailable()
      val n = spark.table("rocksdb_dedup").count()
      q.stop()
      assert(n == 100000L, s"watermark dedup over RocksDB kept $n of 100000 keys")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("state store escape hatch: spark.graft.streaming.stateStore=hdfs is honored") {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(provKey)
    spark.conf.unset(provKey)
    spark.conf.set("spark.graft.streaming.stateStore", "hdfs")
    try {
      StreamIngest.applyStateStoreDefaults(spark)
      // conf.get reports the built-in default (HDFSBackedStateStoreProvider)
      // when unset — the hatch's contract is that RocksDB was NOT installed
      assert(!spark.conf.get(provKey).contains("RocksDB"),
        "escape hatch must leave the built-in HDFS-backed provider in place")
    } finally {
      spark.conf.unset("spark.graft.streaming.stateStore")
      prior.foreach(spark.conf.set(provKey, _))
    }
  }

  test("an explicitly-set non-default state store provider is never overwritten") {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(provKey)
    val custom = "com.example.state.CustomStateStoreProvider"
    spark.conf.set(provKey, custom)
    try {
      StreamIngest.applyStateStoreDefaults(spark)
      assert(spark.conf.get(provKey) == custom,
        "a user's explicit provider choice through the standard conf was replaced")
      // and the unset/default case still upgrades to RocksDB
      spark.conf.unset(provKey)
      StreamIngest.applyStateStoreDefaults(spark)
      assert(spark.conf.get(provKey).contains("RocksDB"))
    } finally {
      spark.conf.unset(provKey)
      prior.foreach(spark.conf.set(provKey, _))
    }
  }
}
