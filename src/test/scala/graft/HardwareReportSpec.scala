package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.hardware.HardwareReport

/** Golden-port tests of the hardware pipeline stages against the reference's
  * own test expectations (tests/test_hardware_report.py:87-190).
  */
class HardwareReportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** DEVICE_MAP_SAMPLE (tests/test_hardware_report.py:5-20) in our inverted
    * (vendor|device) -> (family, chipset) shape. */
  private val deviceMap = Map(
    "0x10de|0x13c1" -> ("Maxwell", "GM204"),
    "0x10de|0x13c2" -> ("Maxwell", "GM204"),
    "0x10de|0x13d7" -> ("Maxwell", "GM204M")
  )

  /** The 6-client synthetic of test_transform_dimensions (:90-140),
    * expressed as the per-combo joint table our pipeline consumes. Client 1
    * carries every "1-count" marginal; clients 2-6 the "5-count" ones.
    */
  private def inputDf = {
    val c1 = ("Windows_NT-10.0", "x86-64", 4, "GenuineIntel", "3.6",
      "1920x1080", 14, true, true, "0x10de", "0x13c2", 1L)
    val c5 = ("Windows_NT-6.2", "x86-64", 8, "GenuineIntel", "Other",
      "2560x1440", 17, false, false, "0x1414", "0xfefe", 5L)
    Seq(c1, c5).toDF(
      "os", "browser_arch", "cpu_cores", "cpu_vendor", "cpu_speed",
      "resolution", "memory_gb", "has_flash", "is_wow64",
      "gfx0_vendor_id", "gfx0_device_id", "client_count"
    )
  }

  test("aggregateDimensions reproduces transform_dimensions golden (:142-158)") {
    val out = HardwareReport
      .aggregateDimensions(inputDf, deviceMap)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val expected = Map(
      ("os", "Windows_NT-10.0") -> 1L,
      ("os", "Windows_NT-6.2") -> 5L,
      ("browser_arch", "x86-64") -> 6L,
      ("cpu_cores", "4") -> 1L,
      ("cpu_cores", "8") -> 5L,
      ("cpu_vendor", "GenuineIntel") -> 6L,
      ("cpu_speed", "3.6") -> 1L,
      ("cpu_speed", "Other") -> 5L,
      ("resolution", "1920x1080") -> 1L,
      ("resolution", "2560x1440") -> 5L,
      ("memory_gb", "14") -> 1L,
      ("memory_gb", "17") -> 5L,
      ("has_flash", "True") -> 1L,
      ("has_flash", "False") -> 5L,
      ("os_arch", "x86-64") -> 6L,
      ("gfx0_vendor_name", "NVIDIA") -> 1L,
      ("gfx0_vendor_name", "Microsoft Basic") -> 5L,
      ("gfx0_model", "Maxwell-GM204") -> 1L,
      ("gfx0_model", "Other") -> 5L
    )
    assert(out == expected)
  }

  test("collapseBuckets reproduces collapse_buckets golden (:161-190)") {
    val aggregated = Seq(
      ("os", "Windows_NT-10.0", 95L), ("os", "Windows_NT-6.2", 5L),
      ("browser_arch", "x86-64", 100L),
      ("cpu_cores", "4", 100L),
      ("cpu_vendor", "GenuineIntel", 100L),
      ("cpu_speed", "4", 2L), ("cpu_speed", "3.6", 48L), ("cpu_speed", "Other", 50L),
      ("resolution", "1920x1080", 100L),
      ("memory_gb", "14", 50L), ("memory_gb", "17", 50L),
      ("has_flash", "True", 1L), ("has_flash", "False", 99L),
      ("os_arch", "x86-64", 100L),
      ("gfx0_vendor_name", "NVIDIA", 60L), ("gfx0_vendor_name", "Microsoft Basic", 40L),
      ("gfx0_model", "Maxwell-GM204", 95L), ("gfx0_model", "Other", 5L)
    ).toDF("dimension", "key", "client_count")
    val out = HardwareReport
      .collapseBuckets(aggregated, 10L, 100L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    val expected = Map(
      ("os", "Windows_NT-10.0") -> 0.95, ("os", "Other") -> 0.05,
      ("browser_arch", "x86-64") -> 1.0,
      ("cpu_cores", "4") -> 1.0,
      ("cpu_vendor", "GenuineIntel") -> 1.0,
      ("cpu_speed", "3.6") -> 0.48, ("cpu_speed", "Other") -> 0.52,
      ("resolution", "1920x1080") -> 1.0,
      ("memory_gb", "14") -> 0.5, ("memory_gb", "17") -> 0.5,
      ("has_flash", "True") -> 0.01, ("has_flash", "False") -> 0.99,
      ("os_arch", "x86-64") -> 1.0,
      ("gfx0_vendor_name", "NVIDIA") -> 0.6,
      ("gfx0_vendor_name", "Microsoft Basic") -> 0.4,
      ("gfx0_model", "Maxwell-GM204") -> 0.95, ("gfx0_model", "Other") -> 0.05
    )
    assert(out == expected)
  }

  test("resolution 0x0 always collapses to Other (:293-295)") {
    val aggregated = Seq(
      ("resolution", "0x0", 90L),
      ("resolution", "1920x1080", 10L)
    ).toDF("dimension", "key", "client_count")
    val out = HardwareReport
      .collapseBuckets(aggregated, 5L, 100L)
      .collect()
      .map(r => r.getString(1) -> r.getLong(2))
      .toMap
    assert(out == Map("Other" -> 90L, "1920x1080" -> 10L))
  }

  test("flatten produces prefixed keys date-desc (:327-358)") {
    val readback = Seq(
      (java.sql.Date.valueOf("2020-01-06"), "os", "Windows_NT-10.0", 0.9),
      (java.sql.Date.valueOf("2020-01-13"), "memory_gb", "16", 0.4)
    ).toDF("date_from", "dimension", "key", "ratio")
    val out = HardwareReport.flatten(readback).collect()
    assert(out.map(_.getString(0)).sameElements(Array("2020-01-13", "2020-01-06")))
    assert(out.map(_.getString(1)).sameElements(Array("ram_16", "osName_Windows_NT-10.0")))
  }

  test("NULL telemetry values become distinct 'None' buckets like Python's str(metric) (:318-321)") {
    // a client whose resolution, cpu_vendor and has_flash are all null:
    // the reference stringifies the raw grouped value, so None is its own
    // bucket — folding it into "False"/losing the key would both diverge
    // and (for string dims) NPE the JSON writer through a null flat_key
    val rows = Seq(
      ("Windows_NT-10.0", "x86-64", 4, null.asInstanceOf[String], "3.6",
        null.asInstanceOf[String], 14, null.asInstanceOf[java.lang.Boolean],
        java.lang.Boolean.TRUE, "0x10de", "0x13c2", 4L),
      ("Windows_NT-10.0", "x86-64", 4, "GenuineIntel", "3.6",
        "1920x1080", 14, java.lang.Boolean.FALSE, java.lang.Boolean.TRUE,
        "0x10de", "0x13c2", 6L)
    ).toDF(
      "os", "browser_arch", "cpu_cores", "cpu_vendor", "cpu_speed",
      "resolution", "memory_gb", "has_flash", "is_wow64",
      "gfx0_vendor_id", "gfx0_device_id", "client_count"
    )
    val out = HardwareReport
      .aggregateDimensions(rows, deviceMap)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out(("resolution", "None")) == 4L)
    assert(out(("cpu_vendor", "None")) == 4L)
    assert(out(("has_flash", "None")) == 4L)
    assert(out(("has_flash", "False")) == 6L)
    // flatten of a surviving None key concatenates cleanly
    val flat = HardwareReport.flatten(
      Seq((java.sql.Date.valueOf("2020-01-06"), "resolution", "None", 0.4))
        .toDF("date_from", "dimension", "key", "ratio")
    ).collect()
    assert(flat(0).getString(1) == "resolution_None")
  }

  test("runWeek fails loudly on a week with no data, like load_data's ValueError (:80-83)") {
    val e = intercept[IllegalArgumentException] {
      HardwareReport.runWeek(
        inputDf.withColumn("date_from", lit(java.sql.Date.valueOf("2020-01-06")))
          .withColumn("date_to", lit(java.sql.Date.valueOf("2020-01-13"))),
        deviceMap,
        java.sql.Date.valueOf("1999-01-04"), // week with no rows
        java.sql.Date.valueOf("1999-01-11")
      )
    }
    assert(e.getMessage.contains("No data"))
  }
}
