package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Bitmap64

/** Streaming EXACT distinct-count per tumbling window — the streaming
  * counterpart of the batch e14 operator, carrying the same
  * [[Bitmap64]] paged id-set as `flatMapGroupsWithState` state.
  *
  * Scale design mirrors [[StreamingHeavyHitters]]: groups are keyed by
  * (window, key, id-shard), and because id → shard is a FUNCTION every
  * occurrence of an id lands in the same shard — the shards partition
  * the id domain, so per-(window, key) distinct is exactly the SUM of
  * shard cardinalities (unlike the HH sketch there is no estimate to
  * merge: bitmap popcounts over disjoint domains add). Raising `shards`
  * spreads a hot key's state across executors; each group's state is
  * O(its shard's touched pages), bounded however fast the stream runs.
  *
  * Emission: a window's shard counts are emitted when the event-time
  * watermark passes the window end (append mode; late in-watermark ids
  * still count because the state lives until timeout). In batch mode
  * each group is processed exactly once, so counts emit eagerly — the
  * same batch-parity convention as the other streaming modules, gated
  * by `StreamingDistinctSpec` against e14's batch answer on the real
  * events table.
  */
object StreamingDistinct {

  final case class IdEvent(ts: Timestamp, key: String, id: Long)

  /** Serialized-bitmap state: canonical bytes, cheap to encode. */
  final case class SetState(bytes: Array[Byte])

  final case class ShardCount(
      window_start_us: Long,
      key: String,
      shard: Int,
      n_distinct: Long
  )

  def distinctPerWindow(
      events: Dataset[IdEvent],
      windowUs: Long = 3600L * 1000000,
      shards: Int = 8,
      watermark: String = "1 hour"
  ): Dataset[ShardCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val withWm =
      if (streaming) events.withWatermark("ts", watermark) else events

    def update(
        key: (Long, String, Int),
        rows: Iterator[IdEvent],
        state: GroupState[SetState]
    ): Iterator[ShardCount] = {
      val (windowStartUs, k, shard) = key
      def emit(s: SetState): Iterator[ShardCount] =
        Iterator.single(
          ShardCount(
            windowStartUs,
            k,
            shard,
            Bitmap64.cardinality(Bitmap64.deserialize(s.bytes))
          )
        )
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        emit(s)
      } else {
        val prev = state.getOption
          .map(s => Bitmap64.deserialize(s.bytes))
          .getOrElse(Map.empty: Bitmap64.Pages)
        val next = rows.foldLeft(prev)((b, r) => Bitmap64.add(b, r.id))
        val nextState = SetState(Bitmap64.serialize(next))
        if (!streaming) emit(nextState) // batch: group seen exactly once
        else {
          state.update(nextState)
          // same defensive clamp as StreamingHeavyHitters: timeout must
          // sit strictly past the current watermark
          state.setTimeoutTimestamp(
            math.max(
              (windowStartUs + windowUs) / 1000,
              state.getCurrentWatermarkMs() + 1
            )
          )
          Iterator.empty
        }
      }
    }

    withWm
      .groupByKey { e =>
        val us = e.ts.getTime * 1000
        val w = us - java.lang.Math.floorMod(us, windowUs)
        (w, e.key, java.lang.Math.floorMod(e.id, shards.toLong).toInt)
      }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update
      )
  }
}
