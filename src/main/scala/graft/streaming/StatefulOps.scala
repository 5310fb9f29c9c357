package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom keyed state beyond what windowed aggregation expresses (ST3+,
  * SURVEY §2.7): `KeyValueGroupedDataset.mapGroupsWithState` /
  * `flatMapGroupsWithState` operators over the event stream.
  *
  * State lives in the streaming state store (checkpointed, partitioned by
  * key hash) — at scale the operative constraints are keys-per-executor
  * memory and state-store compaction, bounded here by timeouts.
  */
object StatefulOps {

  final case class UserState(nEvents: Long, totalValue: Double, nErrors: Long)
  final case class UserUpdate(
      user_id: Long, n_events: Long, total_value: Double,
      n_errors: Long, error_rate: Double)

  /** Running per-user totals with error-rate, updated every micro-batch
    * (Update mode). State never expires here; callers wanting bounded state
    * compose with watermark-based cleanup (see [[expiringUserTotals]]).
    */
  def runningUserTotals(events: DataFrame): Dataset[UserUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"),
        (col("event_type") === "error").cast("long").as("is_err"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double, Long)], state: GroupState[UserState]) =>
          var s = state.getOption.getOrElse(UserState(0L, 0.0, 0L))
          rows.foreach { case (_, v, e) =>
            s = UserState(s.nEvents + 1, s.totalValue + v, s.nErrors + e)
          }
          state.update(s)
          UserUpdate(uid, s.nEvents, s.totalValue, s.nErrors,
            if (s.nEvents == 0) 0.0 else s.nErrors.toDouble / s.nEvents)
      }
  }

  /** Spark 4's transformWithState twin of [[runningUserTotals]] — the
    * modern arbitrary-state API (StatefulProcessor + typed state variables,
    * here a ValueState; TTLConfig/timers available where the legacy
    * GroupState API had only coarse timeouts). Requires the RocksDB state
    * store provider. StatefulSpec proves it emits exactly what the
    * mapGroupsWithState version emits.
    */
  class UserTotalsProcessor
      extends StatefulProcessor[Long, (Long, Double, Long), UserUpdate] {
    @transient private var totals: ValueState[UserState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserState](
        "totals", Encoders.product[UserState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[(Long, Double, Long)],
        timerValues: TimerValues): Iterator[UserUpdate] = {
      var s = if (totals.exists()) totals.get() else UserState(0L, 0.0, 0L)
      rows.foreach { case (_, v, e) =>
        s = UserState(s.nEvents + 1, s.totalValue + v, s.nErrors + e)
      }
      totals.update(s)
      Iterator.single(UserUpdate(uid, s.nEvents, s.totalValue, s.nErrors,
        if (s.nEvents == 0) 0.0 else s.nErrors.toDouble / s.nEvents))
    }
  }

  def runningUserTotalsTws(events: DataFrame): Dataset[UserUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"),
        (col("event_type") === "error").cast("long").as("is_err"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .transformWithState(
        new UserTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }

  final case class SessionState(startUs: Long, endUs: Long, n: Long, total: Double)
  final case class CompletedSession(
      user_id: Long, session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      n_events: Long, total_value: Double)

  /** Full-µs conversions: Timestamp.getTime is ms-truncated, so gap
    * arithmetic must add back the sub-ms part from getNanos.
    */
  private[streaming] def tsToUs(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
  private[streaming] def usToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Merge sorted point/interval runs within `gapMicros` — the shared
    * sessionization sweep of both stateful implementations.
    */
  private[streaming] def sweepMerge(
      intervals: Seq[SessionState], gapMicros: Long): Seq[SessionState] = {
    val merged = scala.collection.mutable.ArrayBuffer.empty[SessionState]
    intervals.sortBy(_.startUs).foreach { iv =>
      if (merged.nonEmpty && iv.startUs - merged.last.endUs <= gapMicros) {
        val m = merged.last
        merged(merged.size - 1) = SessionState(
          m.startUs, math.max(m.endUs, iv.endUs), m.n + iv.n, m.total + iv.total)
      } else merged += iv
    }
    merged.toSeq
  }

  /** Parse a fixed-length interval string to microseconds. */
  private[streaming] def intervalMicros(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0, "session gap must be a fixed-length interval")
    iv.days.toLong * 86400000000L + iv.microseconds
  }

  /** Event-time sessionization emitting COMPLETED sessions (append
    * semantics). State holds ALL open sessions for the key (not just the
    * latest): a session is emitted only once the watermark passes its
    * end + gap, at which point no in-watermark row can still merge into
    * it — emitting any earlier would fragment a true session whose middle
    * rows arrive in a later micro-batch (append output can never be
    * retracted). Each call re-sessionizes stored-sessions + batch rows in
    * one sorted interval sweep, so out-of-order and disjoint-earlier rows
    * are handled uniformly. State size tracks open sessions only. This is
    * the custom-state twin of the built-in `session_window` aggregation
    * (which it generalizes: arbitrary session payload, not just
    * aggregates).
    */
  def completedSessions(events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): Dataset[CompletedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = intervalMicros(gap)

    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
            state: GroupState[Seq[SessionState]]) =>
          // one body serves both the data path and the timeout path (rows
          // is empty when only the timer fired)
          val pts = rows.map { case (_, ts, v) =>
            val us = tsToUs(ts)
            SessionState(us, us, 1L, v)
          }.toSeq
          val merged = sweepMerge(pts ++ state.getOption.getOrElse(Seq.empty), gapMicros)
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.partition(s => s.endUs + gapMicros <= wmUs)
          if (open.nonEmpty) {
            state.update(open)
            // EventTimeTimeout must be strictly beyond the watermark; the
            // earliest open session's end+gap can be at/behind it — clamp
            // so the set never throws (it then closes on the next advance)
            state.setTimeoutTimestamp(math.max(
              open.map(_.endUs).min / 1000 + gapMicros / 1000,
              state.getCurrentWatermarkMs() + 1))
          } else state.remove()
          closed.iterator.map(s =>
            CompletedSession(uid, usToTs(s.startUs), usToTs(s.endUs), s.n, s.total))
      }
  }

  /** transformWithState twin of [[completedSessions]]: same watermark-gated
    * sweep, expressed with the modern API's ListState (one element per open
    * session) and explicit event-time timers — per-key timer management
    * (register/delete) replaces the legacy single-timeout-per-key model.
    */
  class SessionProcessor(gapMicros: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Double), CompletedSession] {
    @transient private var sessions: ListState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sessions = getHandle.getListState[SessionState](
        "sessions", Encoders.product[SessionState], TTLConfig.NONE)

    private def sweep(uid: Long, pts: Seq[SessionState],
        wmMs: Long): Iterator[CompletedSession] = {
      val stored = if (sessions.exists()) sessions.get().toSeq else Seq.empty
      val merged = sweepMerge(pts ++ stored, gapMicros)
      val (closed, open) = merged.partition(s => s.endUs + gapMicros <= wmMs * 1000L)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (open.nonEmpty) {
        sessions.put(open.toArray)
        getHandle.registerTimer(math.max(
          open.map(_.endUs).min / 1000 + gapMicros / 1000, wmMs + 1))
      } else sessions.clear()
      closed.iterator.map(s =>
        CompletedSession(uid, usToTs(s.startUs), usToTs(s.endUs), s.n, s.total))
    }

    override def handleInputRows(uid: Long,
        rows: Iterator[(Long, java.sql.Timestamp, Double)],
        timerValues: TimerValues): Iterator[CompletedSession] =
      sweep(uid, rows.map { case (_, ts, v) =>
        val us = tsToUs(ts)
        SessionState(us, us, 1L, v)
      }.toSeq, timerValues.getCurrentWatermarkInMs())

    override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[CompletedSession] =
      sweep(uid, Seq.empty, timerValues.getCurrentWatermarkInMs())
  }

  def completedSessionsTws(events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): Dataset[CompletedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .transformWithState(
        new SessionProcessor(intervalMicros(gap)), TimeMode.EventTime(), OutputMode.Append())
  }

  /** Same totals but with processing-time state expiry: idle keys time out
    * and emit a final tombstone row — the state-size bound a 100 TB keyed
    * stream needs (flatMapGroupsWithState so timeouts can emit zero-or-one
    * rows).
    */
  def expiringUserTotals(events: DataFrame,
      idleTimeout: String = "10 minutes"): Dataset[UserUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"),
        (col("event_type") === "error").cast("long").as("is_err"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, Double, Long)], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(UserUpdate(uid, s.nEvents, s.totalValue, s.nErrors, -1.0))
          } else {
            var s = state.getOption.getOrElse(UserState(0L, 0.0, 0L))
            rows.foreach { case (_, v, e) =>
              s = UserState(s.nEvents + 1, s.totalValue + v, s.nErrors + e)
            }
            state.update(s)
            state.setTimeoutDuration(idleTimeout)
            Iterator(UserUpdate(uid, s.nEvents, s.totalValue, s.nErrors,
              if (s.nEvents == 0) 0.0 else s.nErrors.toDouble / s.nEvents))
          }
      }
  }
}
