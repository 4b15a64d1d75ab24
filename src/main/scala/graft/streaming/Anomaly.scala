package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.sql.{Date, Timestamp}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming daily-anomaly detection with EXACT batch parity — the
  * streaming face of `EventOps.anomalousDays` (trailing-frame 2σ rule),
  * the way `Funnel` is the streaming face of `funnelConversion`.
  *
  * Semantics: per event type, each day's integer-cents total is compared
  * against the mean/std of the up-to-`frameDays` most recent FINALIZED
  * days (present days, not calendar days — the batch op's ROWS frame).
  * A day finalizes when the watermark passes its end (no more events can
  * arrive for it), so totals are exact under event-time disorder — the
  * same deferred-finalization trade the funnel makes, with the baseline
  * ring as the only long-lived state (≤ frameDays narrow pairs per key;
  * the open-day map is watermark-evicted).
  *
  * Identical code path over a batch Dataset (close every day in order at
  * group end) — `anomaly_typed` shares the `events_anomaly` oracle
  * verbatim, so the state machine is hash-proven against the SQL window
  * formulation.
  */
object Anomaly {

  case class Event(event_type: String, ts: Timestamp, value: Double)
  /** open: epochDay → accumulating cents; ring: last `frameDays`
    * finalized (epochDay, cents), ascending.
    */
  case class AnomalyState(open: Map[Long, Long], ring: Seq[(Long, Long)])
  case class DayAnomaly(event_type: String, day: Date, value: Double,
                        baseline_mean: Double, baseline_std: Double)

  /** SQL ROUND half-away-from-zero on a double, at `scale` decimals —
    * BigDecimal.valueOf is the Double.toString path Spark's Round uses.
    */
  private def sqlRound(v: Double, scale: Int): Double =
    JBigDecimal.valueOf(v).setScale(scale, RoundingMode.HALF_UP).doubleValue()

  private def sqlRoundLong(v: Double): Long =
    if (v >= 0) math.floor(v + 0.5).toLong else -math.floor(-v + 0.5).toLong

  def anomalies(events: Dataset[Event], frameDays: Int = 7,
                quietMs: Long = 24L * 60 * 60 * 1000): Dataset[DayAnomaly] = {
    implicit val outEnc = Encoders.product[DayAnomaly]
    implicit val stEnc = Encoders.product[AnomalyState]
    implicit val keyEnc = Encoders.STRING
    val streaming = events.isStreaming

    // finalize `days` (ascending) against the ring; the 2σ test and every
    // rounding mirror EventOps.anomalousDays term for term
    def close(etype: String, ring0: Seq[(Long, Long)],
              days: Seq[(Long, Long)]): (Seq[DayAnomaly], Seq[(Long, Long)]) = {
      var ring = ring0
      val out = Seq.newBuilder[DayAnomaly]
      for ((day, cents) <- days) {
        val n = ring.size.toLong
        if (n >= 3) {
          val s = ring.map(_._2).sum
          val ss = ring.map(x => x._2 * x._2).sum
          val mean = s.toDouble / n
          val std = math.sqrt((n * ss - s * s).toDouble / (n * (n - 1)))
          if (math.abs(cents.toDouble - mean) > 2.0 * std)
            out += DayAnomaly(etype, Date.valueOf(java.time.LocalDate.ofEpochDay(day)),
              sqlRound(cents.toDouble / 100.0, 2),
              sqlRound(mean / 100.0, 6), sqlRound(std / 100.0, 6))
        }
        ring = (ring :+ (day -> cents)).takeRight(frameDays)
      }
      (out.result(), ring)
    }

    def handle(etype: String, evs: Iterator[Event],
               state: GroupState[AnomalyState]): Iterator[DayAnomaly] = {
      if (state.hasTimedOut) {
        val st = state.get
        state.remove()
        return close(etype, st.ring, st.open.toSeq.sortBy(_._1))._1.iterator
      }
      var open = state.getOption.map(_.open).getOrElse(Map.empty[Long, Long])
      var ring = state.getOption.map(_.ring).getOrElse(Nil)
      var maxTsMs = Long.MinValue
      for (e <- evs) {
        val day = math.floorDiv(e.ts.getTime, 86400000L)
        open = open.updated(day, open.getOrElse(day, 0L) + sqlRoundLong(e.value * 100))
        maxTsMs = math.max(maxTsMs, e.ts.getTime)
      }
      if (!streaming) {
        state.remove()
        return close(etype, ring, open.toSeq.sortBy(_._1))._1.iterator
      }
      // finalize days whose end the watermark has passed — their totals
      // can no longer change
      val wm = state.getCurrentWatermarkMs()
      val (done, still) = open.toSeq.sortBy(_._1).partition {
        case (day, _) => (day + 1) * 86400000L <= wm
      }
      val (emitted, ring2) = close(etype, ring, done)
      state.update(AnomalyState(still.toMap, ring2))
      if (maxTsMs != Long.MinValue)
        // another key may already have advanced the watermark past this
        // key's quiet horizon — a timeout in the past throws
        state.setTimeoutTimestamp(math.max(maxTsMs + quietMs, wm + 1))
      emitted.iterator
    }

    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(handle)
  }
}
