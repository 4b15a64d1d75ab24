package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of the telemetry debounce
  * ([[graft.operators.EventOps.eventsDebounce]]): per (user, event_type)
  * stream, an event within `gapSeconds` of the PREVIOUS RAW event is a
  * double-fire and is dropped; the first event of each burst survives.
  * The batch SQL face is a gaps-and-islands window; incrementally that
  * needs one number of state per key — the last raw event time — which
  * is exactly what `flatMapGroupsWithState` carries here, so a burst
  * split across micro-batches (or across RESTARTS, via the checkpoint)
  * still collapses correctly where a per-batch window would re-admit
  * the first event of every batch.
  *
  * State is bounded by the event-time timeout: a key idle past the gap
  * can be evicted because any later event necessarily starts a new
  * burst — eviction and semantics agree by construction. Works
  * identically over a batch Dataset (one pass per group, no timeouts),
  * which is what the spec uses to prove stream ≡ batch.
  */
object Debounce {

  case class Event(user_id: Long, event_type: String, ts: Timestamp, event_id: Long)
  /** Epoch MICROseconds of the last raw event (Sessionize precision note). */
  case class DebounceState(lastUs: Long)
  case class Kept(user_id: Long, event_type: String, ts: Timestamp, event_id: Long)

  def debounce(events: Dataset[Event], gapSeconds: Long = 5): Dataset[Kept] = {
    def micros(t: Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    implicit val keptEnc = Encoders.product[Kept]
    implicit val stateEnc = Encoders.product[DebounceState]
    implicit val keyEnc = Encoders.product[(Long, String)]
    val streaming = events.isStreaming

    def handle(key: (Long, String), evs: Iterator[Event],
               state: GroupState[DebounceState]): Iterator[Kept] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val gapUs = gapSeconds * 1000000L
      val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var last = state.getOption.map(_.lastUs)
      val kept = Seq.newBuilder[Kept]
      sorted.foreach { e =>
        val t = micros(e.ts)
        if (last.forall(t - _ > gapUs))
          kept += Kept(e.user_id, e.event_type, e.ts, e.event_id)
        // the burst chain follows the RAW sequence (each event extends it),
        // matching the batch face's lag-over-raw-rows definition
        last = Some(t)
      }
      last.foreach { t =>
        if (streaming) {
          state.update(DebounceState(t))
          state.setTimeoutTimestamp(t / 1000 + gapSeconds * 1000)
        } else state.remove()
      }
      kept.result().iterator
    }

    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(handle)
  }
}
