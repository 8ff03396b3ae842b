package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-function library for the graft engine.
  *
  * Pure `Column` compositions (whole-stage-codegen friendly — no UDF objects,
  * no Catalyst extensions needed). Each function re-expresses an external UDF
  * or driver-side Python function of the reference app
  * (mozilla/firefox-public-data-report-etl) as Spark built-ins.
  */
object F {

  /** Monday-anchored week start as a date.
    * Reference: `DATE_TRUNC(submission_date, WEEK(MONDAY))`
    * (scripts/public_data_report_user_activity.sql:11). Spark's
    * `date_trunc("week", _)` is Monday-anchored, matching BQ `WEEK(MONDAY)`.
    */
  def weekStart(d: Column): Column = date_trunc("week", d).cast("date")

  /** Month start as a date. */
  def monthStart(d: Column): Column = date_trunc("month", d).cast("date")

  /** Sunday test — BQ `EXTRACT(DAYOFWEEK FROM d) = 1`
    * (user_activity.sql:12). Spark `dayofweek` is also Sunday=1. */
  def isLastDayOfWeek(d: Column): Column = dayofweek(d) === 1

  /** Popcount of the lowest 7 bits = days active in the trailing week.
    * Reference external UDF `udf.bitcount_lowest_7` (user_activity.sql:117).
    */
  def bitcountLowest7(bits: Column): Column =
    bit_count(bits.bitwiseAND(lit(127L)))

  /** 0-based index of the least-significant set bit = days since the event.
    * NULL for NULL/0 input. Reference external UDF
    * `udf.pos_of_trailing_set_bit` (user_activity.sql:130-131).
    * Identity: x & -x isolates the lowest set bit; popcount(lowbit-1) is its
    * index. Pure column expression — stays inside codegen.
    */
  def posOfTrailingSetBit(bits: Column): Column =
    when(bits.isNull || bits === 0L, lit(null).cast("int"))
      .otherwise(bit_count(bits.bitwiseAND(-bits) - 1))

  /** Major version number from a version string ("72.0.1" -> 72); NULL when
    * the string has no leading digits. Reference external UDF
    * `mozfun.norm.truncate_version(v, "major")` (user_activity.sql:145,156).
    * ANSI-safe: empty regex match maps to NULL before the cast.
    */
  def truncateVersionMajor(v: Column): Column = {
    val m = regexp_extract(v, "^(\\d+)", 1)
    when(m === "", lit(null)).otherwise(m).cast("long")
  }

  /** NULL-on-zero division — BQ `SAFE_DIVIDE` (user_activity.sql:117,130). */
  def safeDiv(a: Column, b: Column): Column = try_divide(a, b)

  /** Exact money arithmetic at scale: a 2-decimal double as integer cents.
    * Sums of cents are exact longs (no float accumulation error), which is
    * what makes results reproducible across engines and partitionings at any
    * data scale.
    */
  def cents(x: Column): Column = round(x * 100).cast("long")

  /** 4-decimal fixed-point as long (e.g. price*(1-discount) products). */
  def fixed4(x: Column): Column = round(x * 10000).cast("long")

  /** OS architecture decode. Faithful port of the 3-branch decision in
    * hardware_report.py:85-114 (`get_os_arch`) — the branch ORDER is
    * semantic: a 64-bit browser build wins over the WOW64 test.
    */
  def osArch(browserArch: Column, osName: Column, isWow64: Column): Column =
    when(browserArch === "x86-64", lit("x86-64"))
      .when(osName === "Windows_NT" && isWow64, lit("x86-64"))
      .when(browserArch === "aarch64", lit("aarch64"))
      .otherwise(lit("x86"))

  /** GPU vendor id -> vendor name, "Other" when unknown. Port of the 13-entry
    * map in hardware_report.py:117-144 (`get_gpu_vendor_name`) as a literal
    * map lookup (broadcast-free, codegen'd — correct at any scale).
    */
  val gpuVendorMap: Map[String, String] = Map(
    "0x1013" -> "Cirrus Logic",
    "0x1002" -> "AMD",
    "0x8086" -> "Intel",
    "Intel Open Source Technology Center" -> "Intel",
    "0x5333" -> "S3 Graphics",
    "0x1039" -> "SIS",
    "0x1106" -> "VIA",
    "0x10de" -> "NVIDIA",
    "0x102b" -> "Matrox",
    "0x15ad" -> "VMWare",
    "0x80ee" -> "Oracle VirtualBox",
    "0x1414" -> "Microsoft Basic",
    "0x106b" -> "Apple"
  )

  def gpuVendorName(vendorId: Column): Column = {
    val m = typedlit(gpuVendorMap)
    coalesce(element_at(m, vendorId), lit("Other"))
  }

  /** Whitespace tokenization (split on runs of whitespace, no empty tokens).
    */
  def wsTokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles from a pre-split word array: n consecutive words
    * joined by a single space. Empty array when fewer than n words.
    * Built from `transform(sequence(...))` — no generator UDF.
    */
  def wordShingles(words: Column, n: Int): Column =
    when(size(words) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(0), size(words) - n),
          i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k + 1)): _*)
        )
      )

  /** Dot product of two float vectors, accumulated in double in index order
    * (deterministic). `zip_with` + `aggregate` — pure codegen'd expressions.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** Euclidean norm of a float vector (double). */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float vectors in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))
}
