package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via `mapGroupsWithState` — the escape hatch for
  * stateful semantics the built-in window/dedup operators can't express
  * (SURVEY §2.B "Stateful dedup across batches" family).
  *
  * Tracks a running per-user profile (event count, value sum, last seen
  * instant). State lives in the state store, partitioned by user_id — the
  * 100 TB posture is one shuffle on the grouping key per micro-batch and
  * O(distinct users) state, never O(events).
  */
object UserState {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class Profile(user_id: Long, n_events: Long,
      total_value: Double, last_seen: java.sql.Timestamp)

  def update(userId: Long, events: Iterator[Event],
      state: GroupState[Profile]): Profile = {
    val prev = state.getOption
      .getOrElse(Profile(userId, 0L, 0.0, new java.sql.Timestamp(0)))
    val next = events.foldLeft(prev) { (p, e) =>
      Profile(userId, p.n_events + 1, p.total_value + e.value,
        if (e.ts.after(p.last_seen)) e.ts else p.last_seen)
    }
    state.update(next)
    next
  }

  /** Running profiles as an update-mode stream. */
  def profiles(spark: SparkSession, events: Dataset[Event]): Dataset[Profile] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  val outputMode: OutputMode = OutputMode.Update()
}
