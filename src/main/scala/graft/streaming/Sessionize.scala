package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via flatMapGroupsWithState (SURVEY.md §2.10):
  * gap-based sessionization with an explicit per-user state machine —
  * the hand-rolled analog of `session_window`, for when session logic
  * outgrows what the built-in can express (counters, funnels, per-session
  * aggregates beyond count).
  *
  * State is bounded two ways: the watermark-driven event-time timeout
  * (Spark evicts idle groups) and the explicit gap check in the handler.
  * Works identically over a `readStream` Dataset (incremental, emits
  * closed sessions per micro-batch) and a batch Dataset (one pass).
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  /** start/last are epoch MICROseconds: `Timestamp.getTime` is
    * millisecond-truncated, and event feeds carry µs precision — a
    * ms-rounded state machine would disagree with the SQL formulation
    * (`events_sessions`) on sub-ms data.
    */
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** Close a session when `gapMs` passes with no event from the user. */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    // local defs: the state handler must not capture the enclosing object
    // (objects aren't serializable; tasks ship the closure to executors)
    def micros(t: Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000) * 1000)
      t.setNanos((Math.floorMod(us, 1000000) * 1000).toInt)
      t
    }
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    val streaming = events.isStreaming // batch: no timeouts → flush at end of group

    def handle(userId: Long, evs: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      val gapUs = gapMs * 1000
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(Session(userId, toTs(s.start), toTs(s.last), s.n))
      }
      val sorted = evs.toSeq.sortBy(e => micros(e.ts))
      var cur = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = micros(e.ts)
        cur match {
          case Some(s) if t - s.last <= gapUs =>
            cur = Some(s.copy(last = t, n = s.n + 1))
          case Some(s) =>
            closed += Session(userId, toTs(s.start), toTs(s.last), s.n)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        if (streaming) {
          state.update(s)
          state.setTimeoutTimestamp(s.last / 1000 + gapMs)
        } else {
          // finite input: the trailing session can never time out — emit it
          closed += Session(userId, toTs(s.start), toTs(s.last), s.n)
          state.remove()
        }
      }
      closed.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(handle)
  }
}
