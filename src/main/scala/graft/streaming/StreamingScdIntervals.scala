package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD interval maintenance — the stateful form of the batch
  * `e20_scd_intervals` operator: each user's event stream collapsed to
  * consecutive same-type segments, a segment version emitted the moment
  * an arriving event PROVES it closed (a different type at a later
  * time), or when the watermark passes its last event (the stream's way
  * of saying "no on-time event can extend it").
  *
  * State per user is O(1) — the open segment (type, bounds, count, its
  * ordinal) — which is the point of the SCD shape: the dimension's
  * history lives in the emitted table, not in memory. The price of O(1)
  * (vs [[StreamingSessionPaths]]' O(events) buffer) is the documented
  * ordering caveat: arrivals are event-time-sorted WITHIN each
  * micro-batch, so a late in-watermark event older than an already-
  * ABSORBED event of a different type lands as its own segment instead
  * of splicing history. Emitted rows carry valid_from/valid_to so a
  * downstream as-of join (j4's plan) reads versions exactly like the
  * batch-built table.
  *
  * Batch parity: one full sorted pass per group → output equals
  * `e20_scd_intervals` row-for-row (open segments emitted eagerly with
  * NULL valid_to), gated in the spec on the real events table.
  */
object StreamingScdIntervals {

  final case class ScdEvent(user_id: Long, event_id: Long, event_type: String, ts: Timestamp)

  /** Open segment: type, first/last event micros, event count, ordinal. */
  final case class OpenSeg(tpe: String, fromUs: Long, lastUs: Long, n: Long, segId: Long)

  final case class ScdOut(
      user_id: Long,
      seg_id: Long,
      event_type: String,
      valid_from_us: Long,
      valid_to_us: Option[Long],
      n_events: Long
  )

  /** `quietUs`: how long a version must be event-free (in event time)
    * before the timeout emits it as the CURRENT version (valid_to =
    * None). A later same-type event then opens a new ordinal — the
    * periodic-snapshot behavior of a streamed SCD table; without a quiet
    * horizon every watermark advance would fragment open versions. */
  def scdIntervals(
      events: Dataset[ScdEvent],
      watermark: String = "1 hour",
      quietUs: Long = 3600L * 1000000
  ): Dataset[ScdOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val withWm =
      if (streaming) events.withWatermark("ts", watermark) else events

    def update(
        userId: Long,
        rows: Iterator[ScdEvent],
        state: GroupState[OpenSeg]
    ): Iterator[ScdOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        // keep a CLOSED tombstone (n == 0) carrying the last ordinal:
        // remove() here restarted seg_id at 1 on the user's next event,
        // seating two different rows under one (user_id, seg_id) key and
        // two CURRENT versions (round-10 review). The tombstone is O(1)
        // per user — the same lifetime class as GrowthAccounting's
        // per-user state — and registers no timer, so it never re-fires.
        state.update(s.copy(n = 0L))
        Iterator(ScdOut(userId, s.segId, s.tpe, s.fromUs, None, s.n))
      } else {
        val sorted = rows
          .map(e => (EventTime.micros(e.ts), e.event_id, e.event_type))
          .toArray
          .sortBy(t => (t._1, t._2))
        val emitted = Seq.newBuilder[ScdOut]
        var open = state.getOption.orNull
        // a tombstone is "no open segment, but the ordinal continues"
        var closedOrdinal = 0L
        if (open != null && open.n == 0L) {
          closedOrdinal = open.segId
          open = null
        }
        sorted.foreach { case (us, _, tpe) =>
          open match {
            case null =>
              open = OpenSeg(tpe, us, us, 1, closedOrdinal + 1L)
            case o if tpe != o.tpe =>
              // the arriving type change proves the open version closed:
              // its valid_to is the successor's valid_from
              emitted += ScdOut(userId, o.segId, o.tpe, o.fromUs, Some(us), o.n)
              open = OpenSeg(tpe, us, us, 1, o.segId + 1)
            case o =>
              open = o.copy(
                fromUs = math.min(o.fromUs, us),
                lastUs = math.max(o.lastUs, us),
                n = o.n + 1
              )
          }
        }
        if (open != null) {
          if (streaming) {
            state.update(open)
            state.setTimeoutTimestamp((open.lastUs + quietUs) / 1000)
          } else {
            emitted += ScdOut(userId, open.segId, open.tpe, open.fromUs, None, open.n)
          }
        }
        emitted.result().iterator
      }
    }

    withWm
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      )(update)
  }
}
