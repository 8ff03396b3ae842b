package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming counterpart of the batch rolling-actives operator (e7):
  * per-day 7-day active users over an unbounded event stream.
  *
  * The batch form fans each (user, day) out to its 7 as-of dates and runs
  * an exact distinct; exact COUNT DISTINCT is not incrementally computable
  * in a streaming agg, so this path uses the SLIDING window
  * (`window(ts, "7 days", "1 day")` — one state row per open window) with
  * approx_count_distinct — the same documented exact→approx switch as
  * [[WeeklyActivity]]/e5. Watermark bounds the number of open windows (7
  * per key) and lets closed windows emit and evict.
  *
  * Works identically on batch and streaming frames, so the error envelope
  * vs the exact batch e7 is testable on one code path.
  */
object RollingActive {

  def rollingActive(events: DataFrame, watermark: String = "8 days"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), "7 days", "1 day").as("w"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_wau"),
        count(lit(1)).as("n_events")
      )
      // the window ENDING at day d+1 covers (d-6 .. d] — label by its
      // inclusive as-of day to line up with the batch e7 output
      .select(
        date_add(col("w.end").cast("date"), -1).as("as_of"),
        col("approx_wau"),
        col("n_events")
      )
  }
}
