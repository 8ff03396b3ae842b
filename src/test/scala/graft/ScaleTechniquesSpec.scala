package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Pins for the storage-layout techniques the 100 TB design leans on but
  * no declared query can show on driver-generated flat parquet: bucketed
  * co-located joins (shuffle elimination), partition pruning, and
  * filter/column pushdown all the way into the scan. Each assertion is on
  * the PHYSICAL plan — the technique either reaches the scan/join or the
  * test fails.
  */
class ScaleTechniquesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed co-located join runs with ZERO shuffle exchanges") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    orders.write
      .bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write
      .bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark
        .table("orders_b")
        .join(spark.table("lineitem_b"), $"o_orderkey" === $"l_orderkey")
      val p = j.queryExecution.executedPlan.toString
      // co-located buckets: the sort-merge join consumes both scans with
      // no repartitioning anywhere in the plan
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"), s"bucketing did not eliminate the shuffle:\n$p")
      // and it computes the same join as the unbucketed form
      val n = j.count()
      val n0 = orders.join(lineitem, $"o_orderkey" === $"l_orderkey").count()
      assert(n == n0 && n > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("runtime bloom-filter join injection prunes the fact side before the shuffle") {
    // Catalyst's runtime row-level filtering: a selective filter on the
    // dim side gets compiled into a bloom filter that is PUSHED onto the
    // fact side's scan branch, so fact rows that cannot join are dropped
    // before they shuffle — at 100 TB this is the difference between
    // shuffling the whole fact table and shuffling the ~matching slice.
    // The application-side size threshold (10GB default) is met naturally
    // at production scale; the test lowers it to prove the mechanism on
    // driver-scale parquet, the same convention as the AQE skew pin.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    )
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val l = Tables.lineitem(spark, sf)
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("bloom"),
        s"runtime bloom filter was not injected:\n$p")
      // the filter is a pure pruning optimization — row-identical result
      val n = j.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val n0 = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == n0 && n > 0)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("partition pruning, filter pushdown and column pruning reach the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables
      .orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write
      .mode("overwrite")
      .partitionBy("o_year")
      .parquet(dir)
    val q = spark.read
      .parquet(dir)
      .filter(col("o_year") === 1995 && col("o_orderkey") < 1000)
      .select("o_orderkey")
    val p = q.queryExecution.executedPlan.toString
    // the partition predicate prunes directories, never scanning them
    assert("PartitionFilters: \\[[^\\]]*o_year#\\d+ = 1995".r.findFirstIn(p).isDefined, p)
    // the row-level predicate reaches the parquet reader
    assert(p.contains("PushedFilters") && p.contains("LessThan(o_orderkey,1000)"), p)
    // only the projected column is decoded
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint>"), p)
    // and the pruned read agrees with the unpruned filter
    val expected = Tables
      .orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1995 && col("o_orderkey") < 1000)
      .count()
    assert(q.count() == expected && expected > 0)
  }
}
