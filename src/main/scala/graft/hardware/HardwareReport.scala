package graft.hardware

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.F

/** The hardware-survey pipeline — the Spark re-expression of
  * `public_data_report/hardware_report/hardware_report.py`.
  *
  * The reference builds one BigQuery query with 11 ARRAY(SELECT AS STRUCT ...)
  * per-dimension aggregations over one scan (hardware_report.py:15-56), then
  * post-processes driver-side (decode :221-275, collapse :278-324, flatten
  * :327-350). Here the whole thing is DataFrame-native:
  *
  *   - dimension decode happens BEFORE aggregation as column expressions
  *     (os_arch / GPU vendor / GPU model), so the "re-sum after decode"
  *     Python loop (A10) disappears into the groupBy;
  *   - the 11 groupings run as one GROUPING SETS pass (Catalyst `Expand`,
  *     single scan — the property the reference got from array subqueries);
  *   - the 1%-threshold two-pass "Other" collapse (A11) is two groupBy
  *     rounds, not a driver loop — it scales to any key cardinality;
  *   - output is long format (dimension, key, client_count, ratio), the
  *     shape that partitions/export cleanly; the JSON export pivots at the
  *     very end on collected (tiny) results.
  */
object HardwareReport {

  /** dimension name -> decoded key expression, in the reference's order
    * (hardware_report.py:20-32 `output_fields`). */
  def dimensionKeys(deviceMap: Map[String, (String, String)]): Seq[(String, Column)] = Seq(
    "os" -> col("os"),
    "browser_arch" -> col("browser_arch"),
    "cpu_cores" -> col("cpu_cores").cast("string"),
    "cpu_vendor" -> col("cpu_vendor"),
    "cpu_speed" -> col("cpu_speed"),
    "resolution" -> col("resolution"),
    "memory_gb" -> col("memory_gb").cast("string"),
    // Python str(bool) capitalization, kept verbatim — and str(None) is
    // a distinct "None" bucket (hardware_report.py:318-321 stringifies
    // the RAW grouped value): folding null into "False" silently
    // inflated hasFlash_False and erased the hasFlash_None series
    "has_flash" -> when(col("has_flash").isNull, "None")
      .when(col("has_flash"), "True")
      .otherwise("False"),
    "os_arch" -> F.osArch(col("browser_arch"), col("os"), col("is_wow64")),
    "gfx0_vendor_name" -> F.gpuVendorName(col("gfx0_vendor_id")),
    "gfx0_model" -> deviceFamilyChipset(deviceMap)
  )

  /** (vendor_id, device_id) -> "family-chipset" or "Other"
    * (hardware_report.py:148-166) as a literal-map lookup. */
  def deviceFamilyChipset(deviceMap: Map[String, (String, String)]): Column = {
    val m = deviceMap.map { case (k, (f, c)) => k -> s"$f-$c" }
    if (m.isEmpty) lit("Other")
    else
      coalesce(
        element_at(
          typedlit(m),
          concat_ws("|", col("gfx0_vendor_id"), col("gfx0_device_id"))
        ),
        lit("Other")
      )
  }

  /** One-pass multi-dimension aggregation (A3): decode dimensions as
    * columns, GROUPING SETS over the 11 singleton sets, un-pivot via
    * grouping_id into long format (dimension, key, client_count).
    * One scan; `Expand` multiplies rows 11x before the partial aggregate —
    * at 100 TB the input here is already the per-combo pre-aggregate
    * (as in the reference), so the expansion is over combos, not clients.
    */
  def aggregateDimensions(
      input: DataFrame,
      deviceMap: Map[String, (String, String)]
  ): DataFrame = {
    val dims = dimensionKeys(deviceMap)
    val decoded = input.select(
      dims.map { case (n, c) => c.as(s"k_$n") } :+ col("client_count"): _*
    )
    val spark = input.sparkSession
    decoded.createOrReplaceTempView("graft_hw_decoded")
    val setList = dims.map { case (n, _) => s"(k_$n)" }.mkString(", ")
    val gid = dims.zipWithIndex
      .map { case ((n, _), i) =>
        // grouping_id bit for column i is (1 << (n-1-i)) when EXCLUDED;
        // the singleton set for dim i has all bits set except its own.
        val g = (0 until dims.size).filter(_ != i).map(j => 1L << (dims.size - 1 - j)).sum
        s"WHEN $g THEN '$n'"
      }
      .mkString(" ")
    val keyExpr = dims.zipWithIndex
      .map { case ((n, _), i) => s"WHEN dimension = '$n' THEN k_$n" }
      .mkString(" ")
    spark.sql(s"""
      WITH g AS (
        SELECT ${dims.map { case (n, _) => s"k_$n" }.mkString(", ")},
               grouping_id() AS gid,
               sum(client_count) AS client_count
        FROM graft_hw_decoded
        GROUP BY GROUPING SETS ($setList)
      )
      SELECT dimension,
             -- str(metric) semantics (hardware_report.py:318-321): a NULL
             -- key (null os/cpu_vendor/resolution/... in telemetry) is
             -- Python's str(None) = a distinct 'None' bucket. Left null
             -- it would concat-propagate to a null flat_key at export
             -- and NPE the JSON writer after all weeks computed.
             coalesce(CASE $keyExpr END, 'None') AS key,
             client_count
      FROM (SELECT *, CASE gid $gid END AS dimension FROM g)
    """)
  }

  /** Faithful 2-pass threshold collapse + ratio normalization
    * (`collapse_buckets`, hardware_report.py:278-324):
    *   - `resolution` key "0x0" always folds into Other;
    *   - keys under `countThreshold` fold to Other — except the
    *     uncollapsed dims (has_flash, os_arch), and `os` first folds to
    *     "<osname>-Other" and only in a second pass to global Other;
    *   - every count is normalized by `sampleCount`.
    * Expressed as two groupBy rounds over the long format.
    */
  def collapseBuckets(
      longDf: DataFrame,
      countThreshold: Long,
      sampleCount: Long
  ): DataFrame = {
    val uncollapsed = Seq("has_flash", "os_arch")
    val pass1 = longDf
      .withColumn(
        "key1",
        when(col("dimension") === "resolution" && col("key") === "0x0", lit("Other"))
          .when(
            col("client_count") < countThreshold &&
              !col("dimension").isin(uncollapsed: _*),
            when(
              col("dimension") === "os",
              concat(split(col("key"), "-", 2).getItem(0), lit("-Other"))
            ).otherwise(lit("Other"))
          )
          .otherwise(col("key"))
      )
      .groupBy("dimension", "key1")
      .agg(sum("client_count").as("client_count"))
    val pass2 = pass1
      .withColumn(
        "key2",
        when(
          col("dimension") === "os" && col("client_count") < countThreshold,
          lit("Other")
        ).otherwise(col("key1"))
      )
      .groupBy(col("dimension"), col("key2").as("key"))
      .agg(sum("client_count").as("client_count"))
    pass2.withColumn("ratio", col("client_count") / lit(sampleCount.toDouble))
  }

  /** Full weekly run (the body of the reference's per-batch loop,
    * hardware_report.py:427-456): filter the week, aggregate + decode +
    * collapse, stamp dates. The caller writes the result with
    * `partitionBy("date_from")` + dynamic partition overwrite — the Spark
    * equivalent of the `table$YYYYMMDD` WRITE_TRUNCATE idempotent weekly
    * upsert (hardware_report.py:459-465).
    */
  def runWeek(
      input: DataFrame,
      deviceMap: Map[String, (String, String)],
      dateFrom: java.sql.Date,
      dateTo: java.sql.Date
  ): DataFrame = {
    val week = input.filter(
      col("date_from") === lit(dateFrom) && col("date_to") === lit(dateTo)
    )
    val sampleCount = week
      .agg(coalesce(sum("client_count"), lit(0L)))
      .head()
      .getLong(0)
    // the reference fails LOUDLY on an empty week (load_data raises
    // ValueError when client_count is NULL, hardware_report.py:80-83) —
    // proceeding would exit 0 having written nothing for the week and
    // re-exported stale JSON as if fresh (a typo'd --date_from, or an
    // input table that hasn't landed yet)
    require(
      sampleCount > 0L,
      s"No data in input for $dateFrom to $dateTo"
    )
    val threshold = (sampleCount * 0.01).toLong // int(total * 0.01), :442
    val longDf = aggregateDimensions(week, deviceMap)
    collapseBuckets(longDf, threshold, sampleCount)
      .withColumn("date_from", lit(dateFrom))
      .withColumn("date_to", lit(dateTo))
  }

  /** Long -> wide flatten for export (`flatten_aggregates`,
    * hardware_report.py:327-350): prefix-translated keys, one record per
    * date, date-desc order. Returns (date, json_key, ratio) — the JSON
    * writer pivots the (tiny) collected result.
    */
  val keyPrefixes: Map[String, String] = Map(
    "browser_arch" -> "browserArch_",
    "cpu_cores" -> "cpuCores_",
    "cpu_vendor" -> "cpuVendor_",
    "cpu_speed" -> "cpuSpeed_",
    "gfx0_vendor_name" -> "gpuVendor_",
    "gfx0_model" -> "gpuModel_",
    "resolution" -> "resolution_",
    "memory_gb" -> "ram_",
    "os" -> "osName_",
    "os_arch" -> "osArch_",
    "has_flash" -> "hasFlash_"
  )

  def flatten(readback: DataFrame): DataFrame = {
    val prefix = typedlit(keyPrefixes)
    readback
      .withColumn("flat_key", concat(element_at(prefix, col("dimension")), col("key")))
      .select(
        date_format(col("date_from"), "yyyy-MM-dd").as("date"),
        col("flat_key"),
        col("ratio")
      )
      .orderBy(col("date").desc, col("flat_key"))
  }
}
