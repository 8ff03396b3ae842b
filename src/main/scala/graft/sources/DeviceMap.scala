package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GPU device-map source + inversion — the Spark re-expression of the
  * reference's HTTP JSON fetch + `invert_device_map`
  * (hardware_report.py:169-218). The environment has no network, so the map
  * ships as a packaged resource (S3 -> S4); the fetched layout is
  *
  *   vendor id -> device family -> chipset -> [device ids]
  *
  * and the consumer needs vendor+device -> (family, chipset). The inversion
  * is a from_json into nested maps + three explodes — a DataFrame, not a
  * driver dict walk, so a million-device map would invert distributed.
  */
object DeviceMap {

  def readResourceText(resource: String): String = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing resource $resource")
    try new String(in.readAllBytes(), "UTF-8")
    finally in.close()
  }

  /** Parse + invert: one row per (gfx0_vendor_id, gfx0_device_id) with its
    * family and chipset, ids '0x'-prefixed like the reference
    * (hardware_report.py:180-184). */
  def load(
      spark: SparkSession,
      resource: String = "/graft/device_map.json"
  ): DataFrame = {
    import spark.implicits._
    val raw = Seq(readResourceText(resource)).toDF("json")
    raw
      .select(
        from_json(
          col("json"),
          org.apache.spark.sql.types.DataType.fromDDL(
            "map<string,map<string,map<string,array<string>>>>"
          )
        ).as("m")
      )
      .select(explode(col("m")).as(Seq("vendor", "families")))
      .select(col("vendor"), explode(col("families")).as(Seq("family", "chipsets")))
      .select(
        col("vendor"),
        col("family"),
        explode(col("chipsets")).as(Seq("chipset", "ids"))
      )
      .select(
        concat(lit("0x"), col("vendor")).as("gfx0_vendor_id"),
        explode(col("ids")).as("raw_id"),
        col("family"),
        col("chipset")
      )
      .select(
        col("gfx0_vendor_id"),
        concat(lit("0x"), col("raw_id")).as("gfx0_device_id"),
        col("family"),
        col("chipset")
      )
  }

  /** Collect the (small) inverted map for literal-lookup decode — keyed
    * "vendor|device" as consumed by HardwareReport.deviceFamilyChipset. */
  def toLookup(df: DataFrame): Map[String, (String, String)] =
    df.collect()
      .map { r =>
        s"${r.getString(0)}|${r.getString(1)}" -> (r.getString(2), r.getString(3))
      }
      .toMap
}
