package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingHeavyHitters
import graft.streaming.StreamingHeavyHitters.Item

class StreamingHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windows emit sharded MG survivors on watermark close, hot items intact") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Item]
    val q = StreamingHeavyHitters
      .heavyHitters(stream.toDS(), k = 4, shards = 2, watermark = "30 minutes")
      .writeStream
      .format("memory")
      .queryName("hh_test")
      .outputMode("append")
      .start()
    try {
      // window [10:00, 11:00): "hot" appears 6x over a 5-item tail
      val hour1 = Seq.fill(6)(Item(ts("2024-01-01 10:05:00"), "hot")) ++
        (1 to 5).map(i => Item(ts("2024-01-01 10:10:00"), s"tail$i"))
      stream.addData(hour1: _*)
      q.processAllAvailable()
      assert(spark.table("hh_test").count() == 0) // window still open

      // an event two hours later pushes the watermark past 11:00
      stream.addData(Item(ts("2024-01-01 13:00:00"), "later"))
      q.processAllAvailable()
      val rows = spark
        .table("hh_test")
        .as[(Long, String, Long, Long)]
        .collect()
        .toSeq
      assert(rows.nonEmpty, "window did not emit on watermark close")
      val hot = rows.filter(_._2 == "hot")
      assert(hot.size == 1, s"hot item missing or duplicated: $rows")
      // MG never overestimates, and hot's shard saw <= 11 items with k=4:
      // underestimate bounded by n_shard/(k+1)
      val est = hot.head._3
      val shardN = hot.head._4
      assert(est <= 6L)
      assert(6L - est <= shardN / 5 + 1, s"est=$est shard_n=$shardN")
      // every window_start is the 10:00 hour
      assert(rows.forall(_._1 == ts("2024-01-01 10:00:00").getTime * 1000))
    } finally q.stop()
  }

  test("a late hot item past the watermark can't inflate a closed window — drop is counted") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Item]
    val q = StreamingHeavyHitters
      .heavyHitters(stream.toDS(), k = 4, shards = 2, watermark = "30 minutes")
      .writeStream
      .format("memory")
      .queryName("hh_late_test")
      .outputMode("append")
      .start()
    try {
      stream.addData(Seq.fill(6)(Item(ts("2024-01-01 10:05:00"), "hot")): _*)
      q.processAllAvailable()
      stream.addData(Item(ts("2024-01-01 13:00:00"), "later"))
      q.processAllAvailable()
      val closed = spark.table("hh_late_test").as[(Long, String, Long, Long)].collect()
        .filter(_._1 == ts("2024-01-01 10:00:00").getTime * 1000)
      assert(closed.exists(_._2 == "hot"), "closed window should report the hot item")

      // 6 more "hot" occurrences aimed at the closed window, behind the
      // watermark: the emitted estimate must stand (no double emission,
      // no count inflation) and the 6 drops must be metric-visible
      stream.addData(Seq.fill(6)(Item(ts("2024-01-01 10:06:00"), "hot")): _*)
      q.processAllAvailable()
      val after = spark.table("hh_late_test").as[(Long, String, Long, Long)].collect()
        .filter(_._1 == ts("2024-01-01 10:00:00").getTime * 1000)
      assert(after.toSeq.sorted == closed.toSeq.sorted,
        "late items must not re-emit or inflate a closed window's survivors")
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 6L,
        s"all 6 late rows must be counted in numRowsDroppedByWatermark, saw $dropped")
    } finally q.stop()
  }

  test("closed-window survivors == a16 exact heavy hitters on the same tokens") {
    // The streaming/batch parity gate: on a fixture where every shard's
    // distinct-item count fits the MG capacity (29 distinct << k=64), the
    // sketch never decrements, so closed-window survivors carry EXACT
    // counts — and thresholding them at the a16 report bar (cnt*64 > n)
    // must reproduce a16HeavyHitters' exact set bit-for-bit.
    implicit val sqlCtx = spark.sqlContext
    val windowItems =
      Seq.fill(100)("alpha") ++ Seq.fill(40)("beta") ++
        Seq.fill(8)("gamma") ++ Seq.fill(5)("delta") ++
        (1 to 25).flatMap(i => Seq.fill(3)(s"tail$i"))
    val n = windowItems.size.toLong // 228: threshold cnt*64 > 228 => cnt >= 4

    val batch = graft.operators.TextOps
      .heavyHittersExact(windowItems.toDF("token"))
      .as[(String, Long, Double)]
      .collect()
      .toSeq
    assert(
      batch.map(_._1).toSet == Set("alpha", "beta", "gamma", "delta"),
      s"fixture does not separate at the threshold: $batch"
    )

    val stream = MemoryStream[Item]
    val q = StreamingHeavyHitters
      .heavyHitters(stream.toDS(), k = 64, shards = 4, watermark = "30 minutes")
      .writeStream
      .format("memory")
      .queryName("hh_parity")
      .outputMode("append")
      .start()
    try {
      stream.addData(windowItems.map(Item(ts("2024-01-01 10:05:00"), _)): _*)
      stream.addData(Item(ts("2024-01-01 13:00:00"), "later")) // close 10:00
      q.processAllAvailable()
      val win10 = ts("2024-01-01 10:00:00").getTime * 1000
      val streamed = spark
        .table("hh_parity")
        .as[(Long, String, Long, Long)]
        .collect()
        .toSeq
        .filter(_._1 == win10)
      // shard totals: one shard_n per shard (item -> shard is the same
      // hashCode formula the operator uses), and they partition n
      val shardTotals = streamed
        .groupBy(r => java.lang.Math.floorMod(r._2.hashCode, 4))
        .map { case (_, rows) => rows.head._4 }
      assert(shardTotals.sum == n, s"shard totals $shardTotals do not partition n=$n")
      val survivorsAboveBar = streamed
        .collect { case (_, item, est, _) if est * 64 > n => item -> est }
        .toMap
      assert(
        survivorsAboveBar == batch.map(t => t._1 -> t._2).toMap,
        s"streaming survivors != batch exact set:\n stream=$survivorsAboveBar\n batch=$batch"
      )
    } finally q.stop()
  }

  test("batch mode emits each window's survivors eagerly — batch parity") {
    val items = (Seq.fill(5)(Item(ts("2024-01-01 10:05:00"), "hot")) ++
      Seq(
        Item(ts("2024-01-01 10:20:00"), "cold"),
        Item(ts("2024-01-01 11:20:00"), "nexthour")
      )).toDS()
    val out = StreamingHeavyHitters
      .heavyHitters(items, k = 4, shards = 2)
      .collect()
      .toSeq
    val hot = out.filter(_.item == "hot")
    assert(hot.size == 1 && hot.head.est_count == 5L)
    // the two windows stay separate
    assert(out.map(_.window_start_us).distinct.size == 2)
    assert(out.exists(_.item == "nexthour"))
  }
}
