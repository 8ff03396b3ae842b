package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.F
import graft.sources.Tables

/** Error envelope of the mergeable approx_percentile sketch against the
  * exact full-sort percentile — the scale switch gate for a14 (same
  * pattern as EventApproxSpec for distinct counts).
  */
class PercentileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_percentile within 1% of exact per group at accuracy 10000") {
    val base = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_returnflag"), F.cents(col("l_extendedprice")).as("c"))
    val rows = base
      .groupBy("l_returnflag")
      .agg(
        percentile(col("c"), lit(0.5)).as("exact50"),
        percentile(col("c"), lit(0.99)).as("exact99"),
        approx_percentile(col("c"), lit(0.5), lit(10000)).cast("double").as("apx50"),
        approx_percentile(col("c"), lit(0.99), lit(10000)).cast("double").as("apx99")
      )
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getDouble(1)) / r.getDouble(1) <= 0.01)
      assert(math.abs(r.getDouble(4) - r.getDouble(2)) / r.getDouble(2) <= 0.01)
    }
  }
}
