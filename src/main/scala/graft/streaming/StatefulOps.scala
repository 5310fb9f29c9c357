package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** Event-time sessionization emitting COMPLETED sessions (append
    * semantics): a session closes when the watermark passes its end + gap,
    * via EventTimeTimeout — state is removed on emit, so state size tracks
    * only open sessions. This is the custom-state twin of the built-in
    * `session_window` aggregation (which it generalizes: arbitrary session
    * payload, not just aggregates).
    */
  def completedSessions(events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): Dataset[CompletedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0, "session gap must be a fixed-length interval")
    val gapMicros = iv.days.toLong * 86400000000L + iv.microseconds

    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
            state: GroupState[SessionState]) =>
          def toTs(us: Long) = new java.sql.Timestamp(us / 1000)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(CompletedSession(uid, toTs(s.startUs), toTs(s.endUs), s.n, s.total))
          } else {
            // Sessionize the union of the stored open session and this
            // batch's rows in ONE sorted interval sweep. This handles every
            // arrival order uniformly: an in-watermark row earlier than the
            // stored start merges (and lowers the start) only when it is
            // within the gap of the session's SPAN, and a row more than a
            // gap before the stored start forms its own earlier session
            // instead of being glued across a silent period longer than
            // the gap. All sessions but the latest are emitted closed;
            // the latest stays open in state.
            val intervals = (rows.map { case (_, ts, v) =>
              SessionState(ts.getTime * 1000L, ts.getTime * 1000L, 1L, v)
            }.toSeq ++ state.getOption.toSeq).sortBy(_.startUs)
            val merged = scala.collection.mutable.ArrayBuffer.empty[SessionState]
            intervals.foreach { iv =>
              if (merged.nonEmpty && iv.startUs - merged.last.endUs <= gapMicros) {
                val m = merged.last
                merged(merged.size - 1) = SessionState(
                  m.startUs, math.max(m.endUs, iv.endUs),
                  m.n + iv.n, m.total + iv.total)
              } else merged += iv
            }
            if (merged.isEmpty) Iterator.empty
            else {
              val open = merged.last
              state.update(open)
              // EventTimeTimeout requires a timestamp strictly beyond the
              // current watermark; end+gap can be behind it when the batch
              // carried only late rows — clamp so the set never throws (the
              // session then closes on the next watermark advance).
              state.setTimeoutTimestamp(math.max(
                open.endUs / 1000 + gapMicros / 1000,
                state.getCurrentWatermarkMs() + 1))
              merged.init.iterator.map(s =>
                CompletedSession(uid, toTs(s.startUs), toTs(s.endUs), s.n, s.total))
            }
          }
      }
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
