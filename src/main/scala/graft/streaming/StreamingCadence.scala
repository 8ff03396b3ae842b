package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming inter-event cadence — the stateful form of the batch
  * `e24_cadence_histogram` profile: per (user, event_type) the state is
  * ONE long (the last event's micros), and each arrival emits its gap
  * bucket increment (bit length of the gap — e24's integer log2). The
  * histogram itself is a downstream rollup of the emitted increments,
  * so the stateful operator stays O(1) per key and append-only — the
  * cheapest continuous-profiling shape, same ledger convention as
  * [[StreamingGrowthAccounting]] / [[StreamingLastTouch]].
  *
  * Ordering caveat (the [[StreamingScdIntervals]] contract): arrivals
  * sort by event time within each micro-batch; a late in-watermark
  * event older than the stored last timestamp contributes no gap (it
  * cannot splice into already-emitted history) — counted in the
  * emitted `dropped_old` marker rows (bucket = -1) rather than silently
  * skipped, the no-silent-caps convention.
  */
object StreamingCadence {

  final case class CadenceEvent(user_id: Long, event_type: String, event_id: Long, ts: Timestamp)

  /** bucket: bit length of the μs gap; -1 marks an out-of-order arrival
    * that produced no gap (observability, not data). */
  final case class GapOut(event_type: String, user_id: Long, bucket: Int, gap_us: Long)

  private[graft] def bitLen(x: Long): Int =
    (64 - java.lang.Long.numberOfLeadingZeros(x)) max 1

  def gapIncrements(
      events: Dataset[CadenceEvent],
      watermark: String = "1 hour"
  ): Dataset[GapOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val withWm =
      if (streaming) events.withWatermark("ts", watermark) else events

    def update(
        key: (String, Long),
        rows: Iterator[CadenceEvent],
        state: GroupState[Long]
    ): Iterator[GapOut] = {
      val (tpe, userId) = key
      val sorted = rows
        .map(e => (EventTime.micros(e.ts), e.event_id))
        .toArray
        .sortBy(identity)
      val out = Seq.newBuilder[GapOut]
      var last = state.getOption.getOrElse(Long.MinValue)
      sorted.foreach { case (us, _) =>
        if (last == Long.MinValue) last = us
        else if (us >= last) {
          out += GapOut(tpe, userId, bitLen(us - last), us - last)
          last = us
        } else out += GapOut(tpe, userId, -1, 0L) // out-of-order: no gap, counted
      }
      state.update(last)
      out.result().iterator
    }

    withWm
      .groupByKey(e => (e.event_type, e.user_id))
      .flatMapGroupsWithState(
        OutputMode.Append,
        // EventTimeTimeout with NO timers registered: the module needs no
        // timeout, but Spark applies the late-row watermark filter inside
        // flatMapGroupsWithState ONLY under EventTimeTimeout (verified in
        // the 4.1.2 source) — under NoTimeout a past-watermark arrival
        // would reach update() and silently mutate emitted history, where
        // the documented contract (and the late-data spec) says it is
        // dropped and counted in numRowsDroppedByWatermark before the
        // operator. No setTimeoutTimestamp call anywhere => no timer ever
        // fires; batch mode is unaffected (ScdIntervals' precedent).
        GroupStateTimeout.EventTimeTimeout
      )(update)
  }
}
