package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Bitmap64, BitmapBuildAggregator, BitmapMergeCountAggregator}

/** Property checks for the paged exact-distinct bitmap: the set algebra
  * (add/or/popcount), the canonical serialized form, and the distributed
  * aggregation path against countDistinct on randomized multi-partition
  * data — shapes the planted events table never produces (page-boundary
  * ids, far-apart sparse pages, duplicate-heavy streams).
  */
class BitmapAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("add/or/cardinality match reference sets on randomized id streams") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // mix of clustered ids, page-boundary ids, and far-apart pages
      val ids = Seq.fill(400)(rnd.nextInt(10000).toLong) ++
        Seq(0L, 4095L, 4096L, 8191L, 1L << 30, (1L << 30) + 1) ++
        Seq.fill(100)(rnd.nextLong(1L << 40))
      val half = ids.length / 2
      val a = ids.take(half).foldLeft(Map.empty: Bitmap64.Pages)(Bitmap64.add)
      val b = ids.drop(half).foldLeft(Map.empty: Bitmap64.Pages)(Bitmap64.add)
      assert(Bitmap64.cardinality(a) == ids.take(half).distinct.size.toLong)
      val u = Bitmap64.or(a, b)
      assert(Bitmap64.cardinality(u) == ids.distinct.size.toLong, s"seed $seed union")
    }
  }

  test("serialization is canonical and round-trips") {
    val rnd = new scala.util.Random(7)
    val ids = Seq.fill(300)(rnd.nextLong(1L << 20))
    // same SET built in two different orders must serialize identically
    val fwd = ids.foldLeft(Map.empty: Bitmap64.Pages)(Bitmap64.add)
    val rev = ids.reverse.foldLeft(Map.empty: Bitmap64.Pages)(Bitmap64.add)
    val (sf, sr) = (Bitmap64.serialize(fwd), Bitmap64.serialize(rev))
    assert(java.util.Arrays.equals(sf, sr), "non-canonical bytes")
    assert(Bitmap64.cardinality(Bitmap64.deserialize(sf)) == Bitmap64.cardinality(fwd))
    // corrupt length fails loudly instead of counting garbage
    intercept[IllegalArgumentException](Bitmap64.deserialize(sf.drop(1)))
  }

  test("two-stage aggregation equals countDistinct on multi-partition data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(3000) { i =>
      (s"g${i % 3}", s"d${rnd.nextInt(4)}", rnd.nextInt(5000).toLong)
    }
    val df = rows.toDF("grp", "day", "id").repartition(8)
    val build = udaf(new BitmapBuildAggregator)
    val mergeCount = udaf(new BitmapMergeCountAggregator)
    val got = df
      .groupBy("grp", "day")
      .agg(build(col("id")).as("bm"))
      .groupBy("grp")
      .agg(mergeCount(col("bm")).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val expected = rows.groupBy(_._1).view.mapValues(_.map(_._3).distinct.size.toLong).toMap
    assert(got == expected)
  }
}
