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
          .map(e => e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000)
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
              open = OpenSession(o.startUs, math.max(o.lastUs, us), o.nEvents + 1)
          }
        }
        if (open != null) {
          state.update(open)
          // time out once no on-time event could extend this session
          if (streaming)
            state.setTimeoutTimestamp(open.lastUs / 1000 + gapUs / 1000)
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
