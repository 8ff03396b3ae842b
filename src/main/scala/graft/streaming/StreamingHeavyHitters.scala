package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.MisraGriesAggregator

/** Streaming trending-items (heavy hitters) per tumbling window — the
  * streaming counterpart of the batch a16 operator, carrying the same
  * Misra-Gries sketch as `flatMapGroupsWithState` state.
  *
  * Scale design: groups are keyed by (window, hash(item) % shards), and
  * because item → shard is a function, EVERY occurrence of an item lands
  * in the same shard — the shards partition the item domain, so the
  * per-window result is simply the union of shard survivors, no
  * cross-shard count merging. That turns the classic "heavy hitters need
  * one global counter table" problem into embarrassingly parallel state:
  * each group holds ≤ k entries (the MG bound) whatever the stream rate,
  * and raising `shards` spreads a hot window across executors. The MG
  * guarantee degrades gracefully: a shard's survivors contain every item
  * with in-shard frequency > n_shard/(k+1).
  *
  * Emission: a window's sketches are emitted when the event-time
  * watermark passes the window end (append mode — late in-watermark items
  * still count because the state lives until timeout). In batch mode each
  * group is processed exactly once, so survivors are emitted eagerly —
  * the same batch-parity convention as [[StreamingSessionize]].
  */
object StreamingHeavyHitters {

  final case class Item(ts: Timestamp, item: String)

  final case class Sketch(counts: Map[String, Long], nSeen: Long)

  final case class HH(
      window_start_us: Long,
      item: String,
      est_count: Long,
      shard_n: Long
  )

  def heavyHitters(
      items: Dataset[Item],
      windowUs: Long = 3600L * 1000000,
      k: Int = 64,
      shards: Int = 8,
      watermark: String = "1 hour"
  ): Dataset[HH] = {
    val spark = items.sparkSession
    import spark.implicits._
    val streaming = items.isStreaming
    val withWm =
      if (streaming) items.withWatermark("ts", watermark) else items
    val mg = new MisraGriesAggregator(k)

    def update(
        key: (Long, Int),
        rows: Iterator[Item],
        state: GroupState[Sketch]
    ): Iterator[HH] = {
      val (windowStartUs, _) = key
      def emit(s: Sketch): Iterator[HH] =
        s.counts.toSeq
          .sortBy { case (item, c) => (-c, item) }
          .map { case (item, c) => HH(windowStartUs, item, c, s.nSeen) }
          .iterator
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        emit(s)
      } else {
        val prev = state.getOption.getOrElse(Sketch(Map.empty, 0L))
        var buf = prev.counts
        var n = prev.nSeen
        rows.foreach { r => buf = mg.reduce(buf, r.item); n += 1 }
        val next = Sketch(buf, n)
        if (!streaming) emit(next) // batch: group seen exactly once
        else {
          state.update(next)
          // window close + nothing: the watermark itself is the grace.
          // The clamp is a defensive invariant, not a reachable branch:
          // an accepted row has ts >= watermark and ts < window end, so
          // window end > watermark whenever this runs — but an
          // at-or-behind-watermark timeout would throw, so the invariant
          // is enforced here rather than assumed across Spark versions.
          state.setTimeoutTimestamp(
            math.max((windowStartUs + windowUs) / 1000, state.getCurrentWatermarkMs() + 1)
          )
          Iterator.empty
        }
      }
    }

    withWm
      .groupByKey { e =>
        val us = e.ts.getTime * 1000
        val w = us - java.lang.Math.floorMod(us, windowUs)
        (w, java.lang.Math.floorMod(e.item.hashCode, shards))
      }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update
      )
  }
}
