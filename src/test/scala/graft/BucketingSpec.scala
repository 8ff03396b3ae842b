package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Bucketing

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("co-located bucketed join runs with zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      spark.read.parquet(s"$sf/lineitem.parquet"), "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(
      spark.read.parquet(s"$sf/orders.parquet"), "o_b", "o_orderkey", 8)
    // at 100 TB neither side broadcasts - that is the case bucketing
    // serves, so disable auto-broadcast for the assertion
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = Bucketing.colocatedJoin(spark, "li_b", "o_b", ("l_orderkey", "o_orderkey"))
    assert(joined.count() > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
