package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.sources.Tables

/** Event-stream analytics over the driver's `events` table — the batch
  * equivalents of the weekly-cadence telemetry aggregations
  * (hardware_report.py:427-437 weekly loop; user_activity.sql weekly grain),
  * plus sessionization, the canonical event-log operator.
  *
  * The same transforms are exposed for Structured Streaming in
  * `graft.streaming` (tumbling weekly windows + watermark); the batch form
  * here is the oracle-checkable surface.
  */
object EventOps {

  type Q = (SparkSession, String) => DataFrame

  /** Weekly activity rollup per event type: exact distinct users, event
    * counts, fixed-point value sums (user_activity.sql:72-84 shape). */
  private def e1WeeklyActivity(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy(
        F.weekStart(col("ts")).as("week_start"),
        col("event_type")
      )
      .agg(
        countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("n_events"),
        sum(F.fixed4(col("value"))).as("value_f4")
      )
      .orderBy("week_start", "event_type")
  }

  /** Sessionization: a session breaks after a >30 min gap per user. Windowed
    * lag + running sum of boundary flags — all integer/μs arithmetic so the
    * oracle matches exactly. Partitioned by user: shuffles once on user_id,
    * scales linearly with users. */
  private def e2Sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val gapUs = 30L * 60 * 1000000
    val sessions = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L)
      )
      .withColumn(
        "session_id",
        sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
      )
    sessions
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        (max("us") - min("us")).as("span_us")
      )
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        sum("span_us").as("total_span_us"),
        max("n_events").as("max_session_events")
      )
      .orderBy("user_id")
  }

  /** JSON property extraction from the `props` column (S4-adjacent: JSON
    * source decoding as a column op, not a driver-side loop). */
  private def e3JsonExtract(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("k")
      .agg(
        count(lit(1)).as("n_events"),
        sum(F.fixed4(col("value"))).as("value_f4")
      )
      .orderBy("k")
  }

  val queries: Map[String, Q] = Map(
    "e1_weekly_activity" -> (e1WeeklyActivity _),
    "e2_sessionize" -> (e2Sessionize _),
    "e3_json_extract" -> (e3JsonExtract _)
  )

  val oracles: Map[String, String] = Map(
    "e1_weekly_activity" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start, event_type,
         count(DISTINCT user_id) AS users, count(*) AS n_events,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS value_f4
         FROM events GROUP BY 1, 2 ORDER BY week_start, event_type""",
    "e2_sessionize" ->
      """WITH base AS (
           SELECT user_id, event_id, epoch_us(ts) AS us FROM events
         ), flagged AS (
           SELECT user_id, event_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         ), sessioned AS (
           SELECT user_id, us,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM flagged
         ), per_session AS (
           SELECT user_id, session_id, count(*) AS n_events,
             max(us) - min(us) AS span_us
           FROM sessioned GROUP BY user_id, session_id
         )
         SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(sum(span_us) AS BIGINT) AS total_span_us,
           max(n_events) AS max_session_events
         FROM per_session GROUP BY user_id ORDER BY user_id""",
    "e3_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         count(*) AS n_events,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS value_f4
         FROM events GROUP BY k ORDER BY k"""
  )
}
