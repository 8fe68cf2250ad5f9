package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (SURVEY.md §2 Part C): arbitrary per-key
  * state via flatMapGroupsWithState — the escape hatch when built-in
  * windows can't express the semantics (here: sessionization that emits a
  * summary row only when a session *closes*, carrying custom per-session
  * aggregates).
  *
  * State is one small case class per active (user) key; event-time
  * timeout closes sessions when the watermark passes last_ts + gap. At
  * scale, state lives in the state store partitioned by user — O(active
  * users), not O(events).
  */
object StatefulOps {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(
      start: Long, lastTs: Long, nEvents: Long, totalValue: Double)

  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)

  val GapMs: Long = 30 * 60 * 1000L

  /** Streaming sessionizer: emits one row per closed session. Input must
    * be watermarked on ts for event-time timeout to fire.
    */
  def closedSessions(events: Dataset[Event]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(
              userId, new Timestamp(s.start), new Timestamp(s.lastTs),
              s.nEvents, s.totalValue))
          } else {
            // Events within a microbatch may arrive unordered per key.
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs < GapMs =>
                  cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed ::= ClosedSession(userId, new Timestamp(s.start),
                    new Timestamp(s.lastTs), s.nEvents, s.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + GapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Batch reference implementation of the same semantics (all sessions,
    * including the final open one per user) — what the streaming result
    * must converge to once the watermark passes everything.
    */
  def allSessionsBatch(spark: SparkSession, events: Dataset[Event]): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, it: Iterator[Event]) =>
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val out = scala.collection.mutable.ListBuffer.empty[ClosedSession]
        var cur: Option[SessionState] = None
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastTs < GapMs =>
              cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
                totalValue = s.totalValue + e.value))
            case Some(s) =>
              out += ClosedSession(userId, new Timestamp(s.start),
                new Timestamp(s.lastTs), s.nEvents, s.totalValue)
              cur = Some(SessionState(t, t, 1, e.value))
            case None => cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach(s => out += ClosedSession(userId, new Timestamp(s.start),
          new Timestamp(s.lastTs), s.nEvents, s.totalValue))
        out.iterator
      }
  }
}
