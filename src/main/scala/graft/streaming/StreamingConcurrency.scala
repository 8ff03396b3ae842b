package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CONCURRENCY monitor — the stateful form of the batch
  * `j10b_concurrency_profile`: per calendar day, how many sessions were
  * active and the exact MAXIMUM simultaneously active, maintained
  * continuously over a stream of CLOSED session intervals (the natural
  * upstream is [[StreamingSessionize]]'s emissions; a session is only
  * knowable at close, so the interval's event time is its END).
  *
  * Shape: intervals are split at day boundaries into pieces BEFORE
  * keying (flatMap, stateless), then each day buffers its pieces' ±1
  * edges until the event-time timer proves the day complete, sweeps the
  * buffer exactly (sort by (us, delta), running sum, max — j10b's
  * arithmetic verbatim), and emits ONE row. State per open day is
  * O(sessions that day) — window-bounded, [[StreamingSessionPaths]]'s
  * state class, never stream-length-bounded; a closed day collapses to
  * an O(1) tombstone (the [[StreamingGrowthAccounting]] lifetime-flag
  * pattern) so stragglers are DETECTED, not mis-counted.
  *
  * The day-close rule is honest about long sessions: a piece for day d
  * arrives with event time e_us, which for a session still running days
  * later exceeds d's end by the session's span — so the timer fires at
  * day_end + maxSpan (contract: sessions longer than maxSpan are the
  * anomaly, not the rule; gap-bounded sessions are hours). A piece for
  * a day the watermark already proves complete closes that day on the
  * spot (its timer would be in the past); a piece arriving AFTER its
  * day emitted yields a marker row (n_sessions = pieces missed,
  * max_concurrent = −1) — e24's counted-marker convention: late data
  * is visible downstream, never silently folded into a published
  * number or dropped.
  *
  * Batch parity: on a non-streaming Dataset each day processes once in
  * full and emits eagerly — row-identical to j10b over the same
  * intervals (spec-gated against the declared query on the real events
  * table, with an INDEPENDENT driver-side sessionizer building the
  * intervals).
  */
object StreamingConcurrency {

  /** A closed session interval; ts must be the session END instant
    * (the moment the interval becomes knowable). */
  final case class ConcInterval(user_id: Long, s_us: Long, e_us: Long, ts: Timestamp)

  /** One day's state: buffered ±1 edges until the day closes, then a
    * closed tombstone for straggler detection. */
  final case class DayState(edges: Vector[(Long, Long)], closed: Boolean)

  final case class ConcOut(day_num: Long, n_sessions: Long, max_concurrent: Long)

  final case class DayPiece(day_num: Long, ps: Long, pe: Long, ts: Timestamp)

  val DayUs: Long = 86400L * 1000000
  private val DayMs = 86400L * 1000

  def concurrencyRows(
      intervals: Dataset[ConcInterval],
      watermark: String = "1 hour",
      maxSpanDays: Int = 2
  ): Dataset[ConcOut] = {
    val spark = intervals.sparkSession
    import spark.implicits._
    val streaming = intervals.isStreaming
    val maxSpanMs = maxSpanDays.toLong * DayMs
    // locals, not object members, inside the closures below: the
    // enclosing object isn't Serializable (SessionPaths' convention)
    val dayUs = DayUs
    val dayMs = DayMs

    // j10b's sweep arithmetic verbatim: inclusive [ps, pe] pieces → +1
    // at ps, −1 at pe+1, ties order (us, delta) so −1 applies first at
    // an instant where one interval ends and another starts
    def sweep(edges: Vector[(Long, Long)]): (Long, Long) = {
      val sorted = edges.sortBy(identity)
      var run = 0L
      var mx = 0L
      sorted.foreach { case (_, d) => run += d; if (run > mx) mx = run }
      (edges.count(_._2 == 1L).toLong, mx)
    }

    val piecesRaw = intervals.flatMap { iv =>
      (iv.s_us / dayUs to iv.e_us / dayUs).map { d =>
        DayPiece(d, math.max(iv.s_us, d * dayUs), math.min(iv.e_us, (d + 1) * dayUs - 1), iv.ts)
      }
    }
    // the watermark goes on the PIECES: a typed flatMap re-serializes its
    // output, so a tag set on the input column would not propagate
    val pieces =
      if (streaming) piecesRaw.withWatermark("ts", watermark) else piecesRaw

    def update(
        day: Long,
        rows: Iterator[DayPiece],
        state: GroupState[DayState]
    ): Iterator[ConcOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.update(DayState(Vector.empty, closed = true))
        val (n, mx) = sweep(s.edges)
        Iterator(ConcOut(day, n, mx))
      } else {
        val arrived = rows.toVector
        val st = state.getOption.getOrElse(DayState(Vector.empty, closed = false))
        if (st.closed) {
          // stragglers after emission: counted marker, never silent
          Iterator(ConcOut(day, arrived.size.toLong, -1L))
        } else {
          val edges = st.edges ++ arrived.flatMap(p => Vector((p.ps, 1L), (p.pe + 1, -1L)))
          if (streaming) {
            val timeout = (day + 1) * dayMs + maxSpanMs
            if (state.getCurrentWatermarkMs() >= timeout) {
              // the watermark already proves this day complete (a
              // contract-violating long session can reach back into it —
              // a timer here would be in the past and throw): close NOW
              // with whatever it has; a later arrival hits the tombstone
              state.update(DayState(Vector.empty, closed = true))
              val (n, mx) = sweep(edges)
              Iterator(ConcOut(day, n, mx))
            } else {
              state.update(DayState(edges, closed = false))
              state.setTimeoutTimestamp(timeout)
              Iterator.empty
            }
          } else {
            val (n, mx) = sweep(edges)
            Iterator(ConcOut(day, n, mx))
          }
        }
      }
    }

    pieces
      .groupByKey(_.day_num)
      .flatMapGroupsWithState(
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      )(update)
  }
}
