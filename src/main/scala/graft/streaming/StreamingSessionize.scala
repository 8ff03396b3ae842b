package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the custom-state counterpart of the
  * batch `e2_sessionize` operator, via
  * `KeyValueGroupedDataset.flatMapGroupsWithState`.
  *
  * Semantics match the batch operator: a session breaks after a gap larger
  * than `gapUs`. A session is emitted when a later event proves the gap
  * (append-mode incremental output), or when the event-time watermark
  * passes the open session's timeout (no more on-time events can extend
  * it). State per user is O(1): just the open session — this is what makes
  * the operator runnable over an unbounded stream where the batch window
  * form would need the full history.
  *
  * Batch parity: applied to a non-streaming Dataset the operator emits
  * exactly the batch `e2_sessionize` result — each group is processed once,
  * so the trailing open session is emitted eagerly instead of waiting for a
  * timeout that batch execution never fires. Late (in-watermark) events
  * extend an open session on BOTH ends (min start, max end), keeping
  * session_start_us = min(event times).
  */
object StreamingSessionize {

  final case class SessionEvent(user_id: Long, ts: Timestamp)

  /** Open-session state per user. */
  final case class OpenSession(startUs: Long, lastUs: Long, nEvents: Long)

  final case class SessionOut(
      user_id: Long,
      session_start_us: Long,
      session_end_us: Long,
      n_events: Long
  )

  val defaultGapUs: Long = 30L * 60 * 1000000

  def sessionize(
      events: Dataset[SessionEvent],
      gapUs: Long = defaultGapUs,
      watermark: String = "1 hour"
  ): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val withWm =
      if (streaming) events.withWatermark("ts", watermark) else events

    def update(
        userId: Long,
        rows: Iterator[SessionEvent],
        state: GroupState[OpenSession]
    ): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        // watermark passed: the open session can no longer be extended
        val s = state.get
        state.remove()
        Iterator(SessionOut(userId, s.startUs, s.lastUs, s.nEvents))
      } else {
        val sorted = rows
          .map(e => EventTime.micros(e.ts))
          .toArray
          .sorted
        var open = state.getOption.orNull
        val emitted = Seq.newBuilder[SessionOut]
        sorted.foreach { us =>
          open match {
            case null =>
              open = OpenSession(us, us, 1)
            case o if us - o.lastUs > gapUs =>
              emitted += SessionOut(userId, o.startUs, o.lastUs, o.nEvents)
              open = OpenSession(us, us, 1)
            case o =>
              // min on start too: a late in-watermark event can precede the
              // open session's first event, and session_start_us must stay
              // min(event times) like the batch operator's
              open = OpenSession(
                math.min(o.startUs, us),
                math.max(o.lastUs, us),
                o.nEvents + 1
              )
          }
        }
        if (open != null) {
          if (streaming) {
            state.update(open)
            // time out once no on-time event could extend this session
            state.setTimeoutTimestamp(open.lastUs / 1000 + gapUs / 1000)
          } else {
            // batch: each group is processed exactly once and no timeout
            // ever fires, so the trailing open session is final — emit it
            // here so batch output equals the batch e2 operator's
            emitted += SessionOut(userId, open.startUs, open.lastUs, open.nEvents)
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
