package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.sources.Tables

/** The flagship pipeline-shaped query: the user-activity aggregate build
  * (scripts/public_data_report_user_activity.sql:1-361) re-expressed over the
  * TPC-H-ish testdata — several weekly per-group metric CTEs from one shared
  * base, assembled by a multi-way equi-join on (week_start, group), with a
  * NOT IN week exclusion (J3 + P6 + A4/A5/A7 in one plan).
  *
  * Scale notes: the base is computed once (each metric aggregates the same
  * scan — Catalyst reuses the exchange under AQE); all post-aggregation
  * joins are on tiny keyspaces (weeks × nations) → broadcast.
  */
object PipelineOps {

  type Q = (SparkSession, String) => DataFrame

  /** J3: multiway join of weekly metric CTEs — MAU-like exact distinct,
    * order counts + exact cents revenue, a countif ratio, and an exact
    * average — joined USING (week_start, n_name). */
  private def j3WeeklyMetrics(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .join(
        broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey")
      )
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(
        F.weekStart(col("o_orderdate")).as("week_start"),
        col("n_name"),
        col("o_custkey"),
        col("o_orderstatus"),
        F.cents(col("o_totalprice")).as("total_cents")
      )
    val mau = base
      .groupBy("week_start", "n_name")
      .agg(countDistinct(col("o_custkey")).as("active_customers"))
    val volume = base
      .groupBy("week_start", "n_name")
      .agg(
        count(lit(1)).as("n_orders"),
        sum("total_cents").as("revenue_cents")
      )
    val finished = base
      .groupBy("week_start", "n_name")
      .agg(
        F.safeDiv(
          count(when(col("o_orderstatus") === "F", 1)),
          count(lit(1))
        ).as("finished_ratio")
      )
    val avgValue = base
      .groupBy("week_start", "n_name")
      .agg(
        (sum("total_cents") / count(lit(1))).as("avg_order_cents")
      )
    val excluded = Seq("1995-12-25", "1996-12-30")
    // post-agg joins: the (week, nation) keyspace is bounded by
    // construction (weeks × 25 nations) at ANY fact scale, so the metric
    // CTE outputs broadcast — explicitly, not by stats luck (unhinted,
    // Catalyst sees unknown-size aggregates and plans 3 sort-merge joins)
    mau
      .join(broadcast(volume), Seq("week_start", "n_name"))
      .join(broadcast(finished), Seq("week_start", "n_name"))
      .join(broadcast(avgValue), Seq("week_start", "n_name"))
      .filter(!col("week_start").cast("string").isin(excluded: _*))
      .orderBy("week_start", "n_name")
  }

  val queries: Map[String, Q] = Map(
    "j3_weekly_metrics" -> (j3WeeklyMetrics _)
  )

  val oracles: Map[String, String] = Map(
    "j3_weekly_metrics" ->
      """WITH base AS (
           SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
             n_name, o_custkey, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
         ), mau AS (
           SELECT week_start, n_name,
             count(DISTINCT o_custkey) AS active_customers
           FROM base GROUP BY 1, 2
         ), volume AS (
           SELECT week_start, n_name, count(*) AS n_orders,
             CAST(sum(total_cents) AS BIGINT) AS revenue_cents
           FROM base GROUP BY 1, 2
         ), finished AS (
           SELECT week_start, n_name,
             CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE)
               / nullif(count(*), 0) AS finished_ratio
           FROM base GROUP BY 1, 2
         ), avg_value AS (
           SELECT week_start, n_name,
             CAST(sum(total_cents) AS BIGINT) / CAST(count(*) AS DOUBLE)
               AS avg_order_cents
           FROM base GROUP BY 1, 2
         )
         SELECT week_start, n_name, active_customers, n_orders, revenue_cents,
           finished_ratio, avg_order_cents
         FROM mau
         JOIN volume USING (week_start, n_name)
         JOIN finished USING (week_start, n_name)
         JOIN avg_value USING (week_start, n_name)
         WHERE CAST(week_start AS VARCHAR) NOT IN ('1995-12-25', '1996-12-30')
         ORDER BY week_start, n_name"""
  )
}
