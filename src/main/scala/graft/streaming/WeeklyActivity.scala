package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface for the weekly-cadence aggregations.
  *
  * The reference runs batch-weekly with backfill re-runs
  * (hardware_report.py:427-437); its "is_last_day_of_week snapshot"
  * semantics (user_activity.sql:12) are equivalent to emitting a tumbling
  * weekly window when it closes. This module expresses that as a streaming
  * transform usable with `readStream` + `writeStream`:
  *
  *   - Monday-anchored tumbling week: `window(ts, "7 days")` with a 4-day
  *     offset (the epoch is a Thursday);
  *   - watermark bounds state: late rows older than the slack are dropped,
  *     matching the reference's "late data = re-run the week" policy but
  *     incrementally;
  *   - COUNT DISTINCT is not incrementally computable in append mode, so
  *     the streaming path uses approx_count_distinct — the documented
  *     exact->approx switch for unbounded inputs (SURVEY §7.4).
  */
object WeeklyActivity {

  /** Monday-aligned weekly tumbling window over an event stream. Works on
    * both batch and streaming DataFrames (same plan — that is the point of
    * Structured Streaming).
    */
  def weeklyCounts(events: DataFrame, watermark: String = "8 days"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(
        window(col("ts"), "7 days", "7 days", "4 days").as("week"),
        col("event_type")
      )
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value")
      )
      .select(
        col("week.start").cast("date").as("week_start"),
        col("event_type"),
        col("approx_users"),
        col("n_events"),
        col("total_value")
      )
  }
}
