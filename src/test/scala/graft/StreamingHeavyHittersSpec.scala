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
