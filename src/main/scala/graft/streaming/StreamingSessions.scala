package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the streaming twin of
  * `Relational.sessionize` (same gap rule), built on
  * `flatMapGroupsWithState`: per-user open-session state, sessions
  * emitted when the event-time watermark passes session end + gap
  * (EventTimeTimeout). State is O(1) per user — the shape that holds
  * at any scale; Spark shuffles by user once and keeps state in the
  * state store across micro-batches.
  */
object StreamingSessions {

  final case class Evt(user_id: Long, ts: Timestamp, event_id: Long)
  final case class OpenSession(sessionId: Long, startMs: Long, endMs: Long, n: Long)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                              session_start: Timestamp, session_end: Timestamp)

  /** events must be a streaming Dataset with a watermark on `ts`. */
  def sessions(events: Dataset[Evt], gapSec: Long = 1800L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Evt], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.sessionId, s.n, new Timestamp(s.startMs), new Timestamp(s.endMs)))
          } else {
            val sorted = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Array.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open = open match {
                case None => Some(OpenSession(0L, t, t, 1L))
                case Some(s) if t - s.endMs > gapMs =>
                  closed += SessionOut(user, s.sessionId, s.n, new Timestamp(s.startMs), new Timestamp(s.endMs))
                  Some(OpenSession(s.sessionId + 1, t, t, 1L))
                case Some(s) =>
                  Some(s.copy(endMs = math.max(s.endMs, t), n = s.n + 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // a late-but-allowed event (watermark delay > gap) can put
              // end + gap behind the current watermark, and Spark rejects
              // past timeout timestamps — clamp forward so the session
              // closes on the next micro-batch instead of killing the query
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(s.endMs + gapMs, wm + 1))
            }
            closed.result().iterator
          }
      }
  }
}
