package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom sessionization via `flatMapGroupsWithState` with EVENT-TIME
  * timeouts — the full form of the stateful escape hatch (SURVEY §2.B
  * "Stateful dedup across batches" / session row): unlike the built-in
  * `session_window` aggregate, the session payload here is arbitrary
  * (first/last event ids, counts, sums — anything the callback builds),
  * and sessions are emitted exactly once, when they CLOSE.
  *
  * Closing happens two ways, both handled:
  *  - in-batch: a new event for the key arrives more than `gap` after the
  *    session's last event — the old session is emitted immediately;
  *  - by watermark: no event arrives and the event-time watermark passes
  *    last_ts + gap — the state times out and the session is emitted.
  *
  * State is O(active users); one shuffle on the key per micro-batch.
  */
object Sessionizer {

  import UserState.Event

  final case class SessionState(
      startMs: Long, lastMs: Long, n: Int, totalValue: Double,
      firstEvent: Long, lastEvent: Long)

  final case class ClosedSession(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int,
      total_value: Double, first_event: Long, last_event: Long)

  private def close(userId: Long, s: SessionState,
      gapMs: Long): ClosedSession =
    ClosedSession(userId,
      new java.sql.Timestamp(s.startMs),
      new java.sql.Timestamp(s.lastMs + gapMs),
      s.n, s.totalValue, s.firstEvent, s.lastEvent)

  def update(gapMs: Long)(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val closed = close(userId, state.get, gapMs)
      state.remove()
      return Iterator(closed)
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    var cur = state.getOption
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastMs >= gapMs =>
          out += close(userId, s, gapMs)
          cur = Some(SessionState(t, t, 1, e.value, e.event_id, e.event_id))
        case Some(s) =>
          // Out-of-order events inside the gap can both pre-date startMs and
          // post-date lastMs; widen both bounds (matches session_window's
          // merge semantics, where a session spans min..max event time).
          // first/last event ids must track the widened bounds: a late
          // event that extends the session backwards becomes first_event,
          // and last_event only moves when event time advances. Timestamp
          // TIES break on event_id (min for first, max for last) so the
          // outcome is a function of the event SET, not of which
          // micro-batch each tied event happened to arrive in.
          cur = Some(s.copy(
            startMs = math.min(s.startMs, t),
            lastMs = math.max(s.lastMs, t), n = s.n + 1,
            totalValue = s.totalValue + e.value,
            firstEvent =
              if (t < s.startMs
                || (t == s.startMs && e.event_id < s.firstEvent))
                e.event_id else s.firstEvent,
            lastEvent =
              if (t > s.lastMs
                || (t == s.lastMs && e.event_id > s.lastEvent))
                e.event_id else s.lastEvent))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value, e.event_id, e.event_id))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // Event-time timeout: fires once the watermark passes this instant.
      state.setTimeoutTimestamp(s.lastMs + gapMs)
    }
    out.iterator
  }

  /** Closed sessions as an append-mode stream. The input must carry a
    * watermark on `ts` (event-time timeouts are measured against it).
    */
  def closedSessions(spark: SparkSession, events: Dataset[Event],
      gap: String, watermark: String): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .safeStringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(gap)) match {
      case null => throw new IllegalArgumentException(s"bad interval: $gap")
      case iv => iv.months match {
        case 0 => iv.days * 86400000L + iv.microseconds / 1000L
        case _ => throw new IllegalArgumentException("month gaps unsupported")
      }
    }
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update(gapMs))
  }
}
