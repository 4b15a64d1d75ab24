package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel with EXACT batch parity via watermark-deferred
  * finalization (the streaming face of `EventOps.funnelConversion`).
  *
  * Why deferred: an incremental per-stage state machine ("record click
  * only if a signup is already recorded") silently under-counts under
  * event-time disorder — a click ARRIVING before its user's earlier-
  * timestamped signup is discarded and gone when the signup lands, and no
  * bounded per-stage summary can repair it (the qualifying click set
  * grows as the signup minimum decreases). The principled fix is the
  * standard streaming-exactness trade: BUFFER the user's stage events
  * until the event-time timeout says the user has gone quiet for
  * `quietMs` (watermark-bounded), then run the exact batch logic — first
  * signup, first strictly-later click, first strictly-later purchase —
  * over the buffer. State is the user's stage events within the horizon:
  * sparse by nature (stage events, not the raw feed), and evicted by the
  * timeout, never accumulated forever.
  *
  * Works identically over a batch Dataset (one pass, flush at group end)
  * — the parity the spec pins against `funnelConversion`'s SQL shape.
  */
object Funnel {

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  /** (stage_index, epoch_micros) buffer — micros, not Timestamp.getTime's
    * truncated millis (the Sessionize lesson).
    */
  case class FunnelState(events: Seq[(Int, Long)])
  case class UserFunnel(user_id: Long, stage: Int)

  def funnel(events: Dataset[Event],
             stages: Seq[String] = Seq("signup", "click", "purchase"),
             quietMs: Long = 30 * 60 * 1000): Dataset[UserFunnel] = {
    require(stages.length == 3, "three-stage funnel")
    def micros(t: Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    implicit val outEnc = Encoders.product[UserFunnel]
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val longEnc = Encoders.scalaLong
    val streaming = events.isStreaming
    val stageOf = stages.zipWithIndex.toMap

    def finalize(userId: Long, buf: Seq[(Int, Long)]): UserFunnel = {
      val byStage = buf.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
      val s0 = byStage.getOrElse(0, Nil).minOption
      val s1 = s0.flatMap(t0 => byStage.getOrElse(1, Nil).filter(_ > t0).minOption)
      val s2 = s1.flatMap(t1 => byStage.getOrElse(2, Nil).filter(_ > t1).minOption)
      UserFunnel(userId, Seq(s0, s1, s2).takeWhile(_.isDefined).length)
    }

    def handle(userId: Long, evs: Iterator[Event],
               state: GroupState[FunnelState]): Iterator[UserFunnel] = {
      if (state.hasTimedOut) {
        val buf = state.get.events
        state.remove()
        return Iterator(finalize(userId, buf))
      }
      val incoming = evs.flatMap(e => stageOf.get(e.event_type).map(_ -> micros(e.ts))).toSeq
      val buf = state.getOption.map(_.events).getOrElse(Nil) ++ incoming
      if (streaming) {
        if (buf.nonEmpty) {
          state.update(FunnelState(buf))
          state.setTimeoutTimestamp(buf.map(_._2).max / 1000 + quietMs)
        }
        Iterator.empty
      } else {
        state.remove()
        if (buf.isEmpty) Iterator.empty else Iterator(finalize(userId, buf))
      }
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(handle)
  }
}
