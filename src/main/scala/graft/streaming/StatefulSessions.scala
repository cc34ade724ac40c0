package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over a stream: per-user session accumulation via
  * `flatMapGroupsWithState` — the Structured-Streaming primitive for
  * semantics the built-in windows can't express (here: emit a session
  * summary ONLY when the session closes, with an explicit inactivity
  * timeout carried in state, ST7's generalization).
  *
  * Scale notes: state lives in the state store, partitioned by the group
  * key — the same hash shuffle as any keyed agg, so 1000 executors hold
  * 1/1000th of the keys each. The state value is O(1) per key (no event
  * buffering), and event-time timeouts are driven by the watermark, so
  * state size is bounded by (active keys × bytes-per-summary).
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts: java.sql.Timestamp,
      event_type: String)
  final case class SessionState(nEvents: Long, start: Long, last: Long)
  final case class ClosedSession(user_id: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      duration_sec: Long)

  /** Fold events into per-user state; emit a ClosedSession when the
    * event-time watermark passes last-seen + gap (timeout), or fold new
    * events in otherwise. */
  def update(gapMs: Long)(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(ClosedSession(userId, s.nEvents,
        new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
        (s.last - s.start) / 1000))
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      val merged = sorted.foldLeft(state.getOption.getOrElse(
        SessionState(0, Long.MaxValue, Long.MinValue))) { (s, e) =>
        SessionState(s.nEvents + 1, math.min(s.start, e.ts.getTime),
          math.max(s.last, e.ts.getTime))
      }
      state.update(merged)
      state.setTimeoutTimestamp(merged.last + gapMs)
      Iterator.empty
    }
  }

  /** Stream of closed sessions: watermark the event time, group by user,
    * run the state machine with event-time timeouts. */
  def closedSessions(spark: SparkSession, events: Dataset[Event],
      gap: String, lateness: String, gapMs: Long): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        update(gapMs))
  }
}
