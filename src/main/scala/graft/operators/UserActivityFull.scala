package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.useractivity.UserActivity

/** Pipeline-level correctness for the user-activity build: the WHOLE
  * 15-CTE composition (`scripts/public_data_report_user_activity.sql:1-361`
  * re-expressed in [[UserActivity.build]]) run over inputs synthesized
  * deterministically from the driver's testdata, with a single DuckDB
  * oracle reproducing every CTE. The per-CTE operators are individually
  * oracle-checked (a4/a5/a6/a7/j4/j6/j7/a9/p6...); this query is the proof
  * the 8-way ASSEMBLY of them is right too — join keys, inner-join
  * survivorship, week exclusion, top-K arrays and all.
  *
  * Input synthesis (pure column functions of orders × customer × nation —
  * no RNG, no driver-side data):
  *   - clients_last_seen: order rows mapped into the pipeline's date window
  *     (`1992-01-01 + n` → `2018-12-31 + n%90`), bit fields / hours /
  *     versions / locales derived by modular arithmetic, 1-2 addon structs
  *     per row (blocklist-matching ids included, NO empty arrays — the
  *     empty/NULL unnest path is pinned by j7 and UserActivitySpec; here it
  *     would put a NULL addon_name group into top-K where Spark sorts
  *     nulls-first but DuckDB nulls-last, a tie-order the reference leaves
  *     unspecified).
  *   - country_names: every nation, named "Country <code>"; the Config
  *     allowlist admits 10 of 25 + Worldwide, so the allowlist filter and
  *     the unmatched-code → Worldwide coalesce both bite.
  *   - buildhub: one build per nation, release channel on even keys.
  *
  * Output pinning: top_addons/top_locales are emitted as CSV strings with
  * ratios as round(r*1e6) integers — every rank and every ratio still
  * hash-checks, without depending on struct-array or float stringification
  * (same contract as v8's q_csv).
  */
object UserActivityFull {

  type Q = (SparkSession, String) => DataFrame

  private[graft] val uaCountries: Seq[String] =
    "Worldwide" +: (0 until 10).map(i => s"Country NATION_$i")

  private[graft] def synthClients(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    def addon(k: Int) = struct(
      ((col("o_orderkey") + k) % 3 === 0).as("is_system"),
      ((col("o_orderkey") + k) % 5 === 0).as("foreign_install"),
      when((col("o_orderkey") + k) % 7 === 0, lit("ext@mozilla.org"))
        .otherwise(concat(lit("addon-"), ((col("o_orderkey") + k) % 7).cast("string")))
        .as("addon_id"),
      concat(lit("Addon "), ((col("o_orderkey") + k) % 7).cast("string")).as("name")
    )
    val nAddons = (col("o_orderkey") % 2 + 1).cast("int")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(
        date_add(
          to_date(lit("2018-12-31")),
          (datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01"))) % 90)
            .cast("int")
        ).as("submission_date"),
        (col("o_orderkey") % 35).cast("int").as("days_since_seen"),
        col("n_name").as("country"),
        ((col("o_orderkey") % 3000) / lit(100.0)).as("subsession_hours_sum"),
        (col("o_orderkey") % 128).as("days_seen_bits"),
        ((col("o_orderkey") * 7) % 128).as("days_created_profile_bits"),
        col("o_custkey").as("client_id"),
        concat((col("o_orderkey") % 5 + 60).cast("string"), lit(".0.1")).as("app_version"),
        concat(lit("loc-"), (col("o_custkey") % 5).cast("string")).as("locale"),
        slice(array(addon(0), addon(1)), lit(1), nAddons).as("active_addons"),
        (col("o_orderkey") % 2).cast("int").as("sample_id")
      )
  }

  private[graft] def synthCountryNames(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d).select(
      col("n_name").as("code"),
      concat(lit("Country "), col("n_name")).as("name")
    )

  private[graft] def synthBuildhub(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d).select(
      struct(
        struct(
          when(col("n_nationkey") % 2 === 0, lit("release"))
            .otherwise(lit("beta"))
            .as("channel"),
          concat((col("n_nationkey") % 8 + 60).cast("string"), lit(".0")).as("version")
        ).as("target"),
        struct(
          date_format(
            date_add(to_date(lit("2018-12-01")), (col("n_nationkey") * 21).cast("int")),
            "yyyy-MM-dd"
          ).as("date")
        ).as("build")
      ).as("build")
    )

  /** CSV pin of a top-K struct array: "name:ppm;name:ppm;..." in rank
    * order, ratio as round(r*1e6) integer (half-up == half-away for
    * positive ratios on both engines). */
  private def pinTopK(arr: Column, nameField: String): Column =
    concat_ws(
      ";",
      transform(
        arr,
        e =>
          concat(
            e.getField(nameField),
            lit(":"),
            round(e.getField("ratio") * 1000000).cast("long").cast("string")
          )
      )
    )

  private def uaFullPipeline(s: SparkSession, d: String): DataFrame = {
    val cfg = UserActivity.Config(countries = uaCountries)
    UserActivity
      .build(synthClients(s, d), synthCountryNames(s, d), synthBuildhub(s, d), cfg)
      .select(
        col("submission_date"),
        col("country_name"),
        col("mau"),
        round(col("avg_hours_usage_daily"), 6).as("avg_hours_usage_daily"),
        col("intensity"),
        col("new_profile_rate"),
        col("latest_version_ratio"),
        pinTopK(col("top_addons"), "addon_name").as("top_addons_csv"),
        col("has_addon_ratio"),
        pinTopK(col("top_locales"), "locale").as("top_locales_csv")
      )
      .orderBy("submission_date", "country_name")
  }

  val queries: Map[String, Q] = Map(
    "ua_full_pipeline" -> (uaFullPipeline _)
  )

  /** The countable-addon predicate (user_activity.sql:204-223) in DuckDB. */
  private val duckCountable: String = {
    val notLikes = UserActivity.addonBlocklist
      .map(p => s"addon_id NOT LIKE '${p.replace("'", "''")}'")
      .mkString(" AND ")
    s"is_system = false AND foreign_install = false AND $notLikes"
  }

  private def trailingBit(c: String): String =
    s"CASE WHEN $c = 0 THEN NULL ELSE bit_count(($c & -$c) - 1) END"

  val oracles: Map[String, String] = Map(
    "ua_full_pipeline" ->
      s"""WITH synth AS (
         |  SELECT
         |    DATE '2018-12-31' + CAST(date_diff('day', DATE '1992-01-01',
         |        CAST(o.o_orderdate AS DATE)) % 90 AS INTEGER) AS submission_date,
         |    CAST(o.o_orderkey % 35 AS INTEGER) AS days_since_seen,
         |    n.n_name AS country,
         |    CAST(o.o_orderkey % 3000 AS DOUBLE) / CAST(100 AS DOUBLE)
         |      AS subsession_hours_sum,
         |    o.o_orderkey % 128 AS days_seen_bits,
         |    (o.o_orderkey * 7) % 128 AS days_created_profile_bits,
         |    o.o_custkey AS client_id,
         |    CAST(o.o_orderkey % 5 + 60 AS VARCHAR) || '.0.1' AS app_version,
         |    'loc-' || CAST(o.o_custkey % 5 AS VARCHAR) AS locale,
         |    o.o_orderkey AS okey
         |  FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  WHERE o.o_orderkey % 2 = 1
         |), smp AS (
         |  SELECT s.*,
         |    CASE WHEN g.w = 1 THEN 'Worldwide'
         |         ELSE 'Country ' || s.country END AS country_name,
         |    CAST(date_trunc('week', s.submission_date) AS DATE) AS week_start,
         |    dayofweek(s.submission_date) = 0 AS is_last_day_of_week
         |  FROM synth s CROSS JOIN (VALUES (0), (1)) g(w)
         |  WHERE (CASE WHEN g.w = 1 THEN 'Worldwide'
         |              ELSE 'Country ' || s.country END)
         |          IN (${uaCountries.map(c => s"'$c'").mkString(", ")})
         |    AND s.submission_date >= DATE '2018-12-31'
         |    AND s.submission_date < DATE '2020-06-29'
         |    AND s.subsession_hours_sum < 24
         |), smp_addons AS (
         |  SELECT week_start, country_name, client_id, locale,
         |    (okey + k.k) % 3 = 0 AS is_system,
         |    (okey + k.k) % 5 = 0 AS foreign_install,
         |    CASE WHEN (okey + k.k) % 7 = 0 THEN 'ext@mozilla.org'
         |         ELSE 'addon-' || CAST((okey + k.k) % 7 AS VARCHAR) END AS addon_id,
         |    'Addon ' || CAST((okey + k.k) % 7 AS VARCHAR) AS addon_name
         |  FROM smp JOIN (VALUES (0), (1)) k(k) ON k.k < 1 + okey % 2
         |  WHERE days_since_seen < 7 AND is_last_day_of_week
         |), mau_wau AS (
         |  SELECT week_start, country_name,
         |    count(DISTINCT CASE WHEN days_since_seen < 28 THEN client_id END) AS mau,
         |    count(DISTINCT CASE WHEN days_since_seen < 7 THEN client_id END) AS wau
         |  FROM smp WHERE is_last_day_of_week GROUP BY 1, 2
         |), daily_usage AS (
         |  SELECT country_name, week_start, avg(au) AS avg_hours_usage_daily
         |  FROM (
         |    SELECT client_id, country_name, week_start,
         |      avg(subsession_hours_sum) AS au
         |    FROM smp WHERE days_since_seen = 0
         |    GROUP BY 1, 2, 3
         |    HAVING avg(subsession_hours_sum) < 24
         |  ) GROUP BY 1, 2
         |), intens AS (
         |  SELECT week_start, country_name,
         |    CAST(CAST(sum(bit_count(days_seen_bits & 127)) AS BIGINT) AS DOUBLE)
         |      / nullif(count(*), 0) AS intensity
         |  FROM smp WHERE is_last_day_of_week AND days_since_seen < 7
         |  GROUP BY 1, 2
         |), npr AS (
         |  SELECT week_start, country_name,
         |    CAST(count(CASE WHEN ${trailingBit("days_created_profile_bits")} < 7
         |               THEN 1 END) AS DOUBLE)
         |      / nullif(count(CASE WHEN ${trailingBit("days_seen_bits")} < 7
         |                    THEN 1 END), 0) AS new_profile_rate
         |  FROM smp WHERE is_last_day_of_week GROUP BY 1, 2
         |), releases AS (
         |  SELECT day, max(major) AS latest_major_version FROM (
         |    SELECT DATE '2018-12-01' + CAST(n_nationkey * 21 AS INTEGER) AS day,
         |      CAST(n_nationkey % 8 + 60 AS BIGINT) AS major
         |    FROM nation WHERE n_nationkey % 2 = 0
         |  ) WHERE day >= DATE '2018-12-01' GROUP BY day
         |), lvr AS (
         |  SELECT country_name, week_start,
         |    CAST(count(CASE WHEN major_version = lmv THEN 1 END) AS DOUBLE)
         |      / nullif(count(*), 0) AS latest_version_ratio
         |  FROM (
         |    SELECT a.client_id, a.country_name, a.major_version, a.week_start,
         |      max(r.latest_major_version) AS lmv
         |    FROM (
         |      SELECT country_name, client_id,
         |        try_cast(nullif(regexp_extract(app_version, '^(\\d+)', 1), '')
         |          AS BIGINT) AS major_version,
         |        submission_date - CAST(days_since_seen AS INTEGER) AS last_day_seen,
         |        week_start
         |      FROM smp WHERE is_last_day_of_week AND days_since_seen < 7
         |    ) a JOIN releases r ON r.day <= a.last_day_seen
         |    GROUP BY 1, 2, 3, 4
         |  ) GROUP BY 1, 2
         |), addon_counts AS (
         |  SELECT week_start, country_name, addon_id, addon_name,
         |    count(DISTINCT CASE WHEN $duckCountable THEN client_id END)
         |      AS user_count
         |  FROM smp_addons GROUP BY 1, 2, 3, 4
         |), top_addons AS (
         |  SELECT week_start, country_name,
         |    array_to_string(list(addon_name || ':' ||
         |      CAST(CAST(round(ratio * 1000000) AS BIGINT) AS VARCHAR)
         |      ORDER BY rnk), ';') AS top_addons_csv
         |  FROM (
         |    SELECT *, row_number() OVER (PARTITION BY week_start, country_name
         |      ORDER BY ratio DESC, addon_name ASC) AS rnk
         |    FROM (
         |      SELECT a.week_start, a.country_name, a.addon_name,
         |        CAST(a.user_count AS DOUBLE) / m.wau AS ratio
         |      FROM addon_counts a
         |      JOIN mau_wau m USING (week_start, country_name)
         |    )
         |  ) WHERE rnk <= 10 GROUP BY 1, 2
         |), has_addon AS (
         |  SELECT week_start, country_name,
         |    CAST(count(DISTINCT CASE WHEN $duckCountable THEN client_id END)
         |        AS DOUBLE)
         |      / nullif(count(DISTINCT client_id), 0) AS has_addon_ratio
         |  FROM smp_addons GROUP BY 1, 2
         |), top_locales AS (
         |  SELECT week_start, country_name,
         |    array_to_string(list(locale || ':' ||
         |      CAST(CAST(round(ratio * 1000000) AS BIGINT) AS VARCHAR)
         |      ORDER BY rnk), ';') AS top_locales_csv
         |  FROM (
         |    SELECT *, row_number() OVER (PARTITION BY week_start, country_name
         |      ORDER BY ratio DESC, locale ASC) AS rnk
         |    FROM (
         |      SELECT c.week_start, c.country_name, c.locale,
         |        CAST(c.user_count AS DOUBLE) / m.wau AS ratio
         |      FROM (
         |        SELECT week_start, country_name, locale,
         |          count(DISTINCT client_id) AS user_count
         |        FROM smp WHERE days_since_seen < 7 AND is_last_day_of_week
         |        GROUP BY 1, 2, 3
         |      ) c JOIN mau_wau m USING (week_start, country_name)
         |    )
         |  ) WHERE rnk <= 5 GROUP BY 1, 2
         |)
         |SELECT m.week_start AS submission_date, m.country_name, m.mau,
         |  round(d.avg_hours_usage_daily, 6) AS avg_hours_usage_daily,
         |  i.intensity, p.new_profile_rate, l.latest_version_ratio,
         |  ta.top_addons_csv, ha.has_addon_ratio, tl.top_locales_csv
         |FROM mau_wau m
         |JOIN daily_usage d USING (week_start, country_name)
         |JOIN intens i USING (week_start, country_name)
         |JOIN npr p USING (week_start, country_name)
         |JOIN lvr l USING (week_start, country_name)
         |JOIN top_addons ta USING (week_start, country_name)
         |JOIN top_locales tl USING (week_start, country_name)
         |JOIN has_addon ha USING (week_start, country_name)
         |WHERE CAST(m.week_start AS VARCHAR) NOT IN ('2019-04-29', '2019-05-06')
         |ORDER BY submission_date, country_name""".stripMargin
  )
}
