package graft.export

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Final JSON shaping + country validation — Spark re-expression of
  * `public_data_report/user_activity/user_activity.py` (export) and the
  * hardware `flatten/upload` path (hardware_report.py:327-381).
  *
  * Everything stays a DataFrame until the terminal collect of an
  * already-tiny aggregated result (weeks x countries); the pivot to nested
  * JSON is a per-country `collect_list(struct(...))` aggregation, not a
  * driver row loop.
  */
object JsonExport {

  /** fxhealth.json rows: per country, date-sorted metric records with the
    * x100 percent scaling (user_activity.py:58-69). */
  def fxhealthRows(userActivity: DataFrame): DataFrame =
    userActivity
      .select(
        col("country_name"),
        struct(
          date_format(col("submission_date"), "yyyy-MM-dd").as("date"),
          struct(
            col("intensity").as("avg_intensity"),
            col("mau").as("MAU"),
            // the reference's exact (unusual) key, parens included
            // (user_activity.py:64) — consumers of the public artifact
            // look this string up verbatim
            col("avg_hours_usage_daily").as("avg_daily_usage(hours)"),
            (col("new_profile_rate") * 100).as("pct_new_user"),
            (col("latest_version_ratio") * 100).as("pct_latest_version")
          ).as("metrics")
        ).as("rec")
      )
      .groupBy("country_name")
      .agg(sortByDate(collect_list(col("rec"))).as("series"))

  /** webusage.json rows: locale/addon ratio maps x100 + pct_addon
    * (user_activity.py:70-83). Map values must share one type, so the
    * heterogeneous metric block stays a struct; the name->pct maps are
    * map_from_entries over the top-K arrays. */
  def webusageRows(userActivity: DataFrame): DataFrame =
    userActivity
      .select(
        col("country_name"),
        struct(
          date_format(col("submission_date"), "yyyy-MM-dd").as("date"),
          struct(
            map_from_entries(
              transform(
                col("top_locales"),
                // Python json.dumps renders a None dict key as "null";
                // Spark maps reject null keys, so coalesce to match
                e => struct(
                  coalesce(e.getField("locale"), lit("null")),
                  e.getField("ratio") * 100
                )
              )
            ).as("locale"),
            map_from_entries(
              transform(
                col("top_addons"),
                e => struct(
                  coalesce(e.getField("addon_name"), lit("null")),
                  e.getField("ratio") * 100
                )
              )
            ).as("top10addons"),
            (col("has_addon_ratio") * 100).as("pct_addon")
          ).as("metrics")
        ).as("rec")
      )
      .groupBy("country_name")
      .agg(sortByDate(collect_list(col("rec"))).as("series"))

  /** Date-ascending sort of collected records via a comparator on the date
    * field only — the records carry MapType metrics, which are not orderable
    * as whole structs (sort_array would reject them). */
  private def sortByDate(recs: org.apache.spark.sql.Column) =
    array_sort(
      recs,
      (l, r) =>
        when(l.getField("date") < r.getField("date"), -1)
          .when(l.getField("date") > r.getField("date"), 1)
          .otherwise(0)
    )

  /** Country-set validation (user_activity.py:85-101): both directions as
    * DataFrame anti-joins; throws on any mismatch, like the reference. */
  def validateCountries(exported: DataFrame, allowlist: Seq[String]): Unit = {
    val spark = exported.sparkSession
    import spark.implicits._
    val allow = allowlist.toDF("country_name")
    val missing = allow
      .join(exported.select("country_name"), Seq("country_name"), "left_anti")
      .as[String].collect()
    val unexpected = exported
      .select("country_name")
      .join(allow, Seq("country_name"), "left_anti")
      .as[String].collect()
    val errors = Seq(
      if (missing.nonEmpty) Some(s"Expected countries missing: ${missing.mkString(", ")}")
      else None,
      if (unexpected.nonEmpty)
        Some(s"Countries not in allowlist but included in output: ${unexpected.mkString(", ")}")
      else None
    ).flatten
    if (errors.nonEmpty)
      throw new RuntimeException(s"Invalid countries in output: ${errors.mkString(", ")}")
  }

  /** Dual-copy artifact write — a stable "latest" name plus a dated archive
    * copy (`name-YYYY-MM-DD.ext`). The reference's object store has no
    * symlinks, so every export is uploaded twice: latest for consumers,
    * the dated copy for history/backfills (hardware_report.py:361-381).
    * `dryRun` skips BOTH sink writes while the caller still computes the
    * artifact — the reference's dry-run contract (hardware_report.py:369,
    * tests/test_hardware_report.py:193-200: no sink is ever constructed). */
  def writeArtifact(
      dir: String,
      name: String,
      json: String,
      archiveDate: String,
      dryRun: Boolean
  ): Unit =
    if (!dryRun) {
      val (base, ext) = name.lastIndexOf('.') match {
        case -1 => (name, "")
        case i => (name.substring(0, i), name.substring(i))
      }
      writeJson(s"$dir/$name", json)
      writeJson(s"$dir/$base-$archiveDate$ext", json)
    }

  /** Minimal JSON writer for the terminal export files (4-space indent like
    * the reference's json.dumps(indent=4)). Values are already collected,
    * tiny, and shaped. */
  def writeJson(path: String, json: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  def toJsonString(df: DataFrame): String = {
    val rows = df.toJSON.collect()
    rows.mkString("[\n", ",\n", "\n]")
  }
}
