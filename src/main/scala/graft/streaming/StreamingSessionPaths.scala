package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}

/** Streaming session-PATH mining — the stateful counterpart of the batch
  * `e18_session_paths` operator: each user's in-session ordered
  * event-type trajectory, emitted as a closed session with its path
  * string (the behavior-trajectory extraction an agent-data pipeline
  * runs continuously over interaction logs).
  *
  * Where [[StreamingSessionize]] keeps O(1) state (span + count), a path
  * needs the ORDER of every open-session event, so state holds the open
  * session's (us, event_id, type) triples — O(session length), bounded
  * by the gap rule however long the stream runs. Each invocation merges
  * state with the batch's arrivals, re-sorts by (us, event_id) — so late
  * in-watermark events land in their true position, not arrival
  * position — walks the 30-min gap rule, emits every session a later
  * event PROVES closed, and keeps the trailing open one. The watermark
  * timeout closes a session no on-time event can extend.
  *
  * Batch parity: applied to a non-streaming Dataset each group is
  * processed exactly once in full, which IS the batch operator's global
  * (us, event_id) order — the trailing session is emitted eagerly. Gated
  * spec-side against e18 path-for-path on the real events table.
  */
object StreamingSessionPaths {

  final case class PathEvent(user_id: Long, event_id: Long, event_type: String, ts: Timestamp)

  /** Open-session state: the session's events, kept sorted. */
  final case class OpenPath(events: Vector[(Long, Long, String)])

  final case class SessionPathOut(
      user_id: Long,
      session_start_us: Long,
      session_end_us: Long,
      n_events: Long,
      path: String
  )

  val defaultGapUs: Long = 30L * 60 * 1000000

  def sessionPaths(
      events: Dataset[PathEvent],
      gapUs: Long = defaultGapUs,
      watermark: String = "1 hour"
  ): Dataset[SessionPathOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val withWm =
      if (streaming) events.withWatermark("ts", watermark) else events

    // local (not a module method): the state closure must not capture the
    // enclosing object, which isn't Serializable
    def toOut(userId: Long, ev: Vector[(Long, Long, String)]): SessionPathOut =
      SessionPathOut(
        userId,
        ev.head._1,
        ev.last._1,
        ev.length.toLong,
        ev.map(_._3).mkString(">")
      )

    def update(
        userId: Long,
        rows: Iterator[PathEvent],
        state: GroupState[OpenPath]
    ): Iterator[SessionPathOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(toOut(userId, s.events))
      } else {
        val arrived = rows.map { e =>
          (EventTime.micros(e.ts), e.event_id, e.event_type)
        }.toVector
        // merge the open session with the arrivals and re-sort: a late
        // in-watermark event takes its TRUE (us, event_id) position
        val all = (state.getOption.map(_.events).getOrElse(Vector.empty) ++ arrived)
          .sortBy(t => (t._1, t._2))
        val emitted = Seq.newBuilder[SessionPathOut]
        var open = Vector.empty[(Long, Long, String)]
        all.foreach { e =>
          if (open.nonEmpty && e._1 - open.last._1 > gapUs) {
            emitted += toOut(userId, open)
            open = Vector(e)
          } else open = open :+ e
        }
        if (open.nonEmpty) {
          if (streaming) {
            state.update(OpenPath(open))
            state.setTimeoutTimestamp(open.last._1 / 1000 + gapUs / 1000)
          } else {
            emitted += toOut(userId, open)
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
