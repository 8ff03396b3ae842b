package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.sources.Tables

/** Scalar-function catalog (SURVEY.md §2.6) — the reference's date/bit/
  * version/string functions exercised as declared queries. Each maps a BQ
  * construct (or external UDF) to pure Spark built-ins; nothing here leaves
  * whole-stage codegen.
  */
object FunctionOps {

  type Q = (SparkSession, String) => DataFrame

  /** F1-F5/F15: date function battery on a bounded slice. */
  private def f1Dates(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 500)
      .select(
        col("o_orderkey"),
        F.weekStart(col("o_orderdate")).as("week_start"),
        F.monthStart(col("o_orderdate")).as("month_start"),
        date_sub(to_date(col("o_orderdate")), 7).as("week_ago"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        F.isLastDayOfWeek(col("o_orderdate")).as("is_sunday"),
        to_date(col("o_orderdate")).as("as_date")
      )
      .orderBy("o_orderkey")
  }

  /** F6: GENERATE_DATE_ARRAY + UNNEST (annotations.py:35-45) — weekly date
    * spine via sequence + explode, left-joined to weekly order counts so
    * empty weeks surface as zero. */
  private def f6DateSpine(s: SparkSession, d: String): DataFrame = {
    val spine = s
      .range(1)
      .select(
        explode(
          sequence(
            lit(java.sql.Date.valueOf("1995-01-02")),
            lit(java.sql.Date.valueOf("2001-07-30")),
            expr("interval 7 days")
          )
        ).as("week_start")
      )
    val weekly = Tables.orders(s, d)
      .groupBy(F.weekStart(col("o_orderdate")).as("week_start"))
      .agg(count(lit(1)).as("cnt"))
    spine
      .join(weekly, Seq("week_start"), "left")
      .select(col("week_start"), coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .orderBy("week_start")
  }

  /** F12: mozfun.norm.truncate_version (user_activity.sql:145) — major
    * version from a synthesized version string; NULL on non-numeric. */
  private def f12VersionMajor(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d)
      .withColumn(
        "version",
        when(pmod(col("p_size"), lit(7)) === 0, lit("beta"))
          .otherwise(
            concat(
              col("p_size").cast("string"),
              lit("."),
              pmod(col("p_partkey"), lit(10)).cast("string"),
              lit(".1")
            )
          )
      )
      .withColumn("major", F.truncateVersionMajor(col("version")))
      .groupBy("major")
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("major").asc_nulls_first)
  }

  /** F13/F14: the two bit-twiddling external UDFs of the reference as pure
    * column math — popcount of low 7 bits, index of lowest set bit (NULL on
    * zero). */
  private def f13Bits(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .select(col("l_orderkey").bitwiseAND(lit(127L)).as("bits"))
      .withColumn("days_since", F.posOfTrailingSetBit(col("bits")).cast("long"))
      .withColumn("active_days", F.bitcountLowest7(col("bits")))
      .groupBy("days_since")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("active_days")).as("sum_active_days")
      )
      .orderBy(col("days_since").asc_nulls_first)
  }

  /** F11: string assembly/split round-trip (hardware_report.py:166,180-184
    * '0x' prefixing and family-chipset joining). */
  private def f11Strings(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d)
      .withColumn("hex_id", concat(lit("0x"), lower(hex(col("p_partkey")))))
      .withColumn("family_chipset", concat_ws("-", col("p_type"), col("p_brand")))
      .withColumn("family", split(col("family_chipset"), "-", 2).getItem(0))
      .select("p_partkey", "hex_id", "family_chipset", "family")
      .orderBy("p_partkey")
  }

  /** F8/F9: array length + null-safe indexing semantics — BQ ARRAY_LENGTH
    * returns NULL for NULL arrays (Spark `size` returns -1 unless guarded)
    * and a[SAFE_OFFSET(i)] is try_element_at. The guard is part of the
    * operator: the oracle checks the BQ-compatible NULL behavior. */
  private def f8ArrayFns(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d)
      .withColumn(
        "tags",
        when(col("o_orderstatus") === "O", lit(null).cast("array<string>"))
          .when(col("o_orderstatus") === "P", array().cast("array<string>"))
          .otherwise(array(col("o_orderpriority"), col("o_orderstatus")))
      )
      .withColumn(
        "n_tags",
        when(col("tags").isNull, lit(null)).otherwise(size(col("tags"))).cast("long")
      )
      .withColumn("first_tag", try_element_at(col("tags"), lit(1)))
      .withColumn("third_tag", try_element_at(col("tags"), lit(3)))
      .groupBy("n_tags", "first_tag", "third_tag")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_tags").asc_nulls_first, col("first_tag").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "f1_dates" -> (f1Dates _),
    "f6_date_spine" -> (f6DateSpine _),
    "f12_version_major" -> (f12VersionMajor _),
    "f13_bits" -> (f13Bits _),
    "f11_strings" -> (f11Strings _),
    "f8_array_fns" -> (f8ArrayFns _)
  )

  val oracles: Map[String, String] = Map(
    "f8_array_fns" ->
      """WITH t AS (
           SELECT CASE WHEN o_orderstatus = 'O' THEN NULL
                       WHEN o_orderstatus = 'P' THEN []
                       ELSE [o_orderpriority, o_orderstatus] END AS tags
           FROM orders
         )
         SELECT CAST(len(tags) AS BIGINT) AS n_tags,
           tags[1] AS first_tag, tags[3] AS third_tag,
           count(*) AS n_orders
         FROM t GROUP BY 1, 2, 3
         ORDER BY n_tags NULLS FIRST, first_tag NULLS FIRST""",
    "f1_dates" ->
      """SELECT o_orderkey,
         CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         CAST(o_orderdate AS DATE) - 7 AS week_ago,
         strftime(o_orderdate, '%Y-%m-%d') AS fmt,
         dayofweek(o_orderdate) + 1 AS dow,
         dayofweek(o_orderdate) = 0 AS is_sunday,
         CAST(o_orderdate AS DATE) AS as_date
         FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""",
    "f6_date_spine" ->
      """WITH spine AS (
           SELECT CAST(t AS DATE) AS week_start
           FROM generate_series(DATE '1995-01-02', DATE '2001-07-30',
                                INTERVAL 7 DAY) AS g(t)
         ), weekly AS (
           SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
             count(*) AS cnt
           FROM orders GROUP BY 1
         )
         SELECT week_start, coalesce(cnt, 0) AS n_orders
         FROM spine LEFT JOIN weekly USING (week_start)
         ORDER BY week_start""",
    "f12_version_major" ->
      """WITH v AS (
           SELECT CASE WHEN p_size % 7 = 0 THEN 'beta'
                       ELSE p_size || '.' || (p_partkey % 10) || '.1' END
             AS version
           FROM part
         )
         SELECT try_cast(nullif(regexp_extract(version, '^(\d+)', 1), '')
                         AS BIGINT) AS major,
           count(*) AS n_parts
         FROM v GROUP BY major ORDER BY major NULLS FIRST""",
    "f13_bits" ->
      """WITH b AS (SELECT l_orderkey & 127 AS bits FROM lineitem)
         SELECT CAST(CASE WHEN bits = 0 THEN NULL
                     ELSE bit_count((bits & -bits) - 1) END AS BIGINT) AS days_since,
           count(*) AS n_rows,
           CAST(sum(bit_count(bits & 127)) AS BIGINT) AS sum_active_days
         FROM b GROUP BY days_since ORDER BY days_since NULLS FIRST""",
    "f11_strings" ->
      """SELECT p_partkey, '0x' || lower(hex(p_partkey)) AS hex_id,
         p_type || '-' || p_brand AS family_chipset,
         split_part(p_type || '-' || p_brand, '-', 1) AS family
         FROM part ORDER BY p_partkey"""
  )
}
