package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
