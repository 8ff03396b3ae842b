package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingLastTouch
import graft.streaming.StreamingLastTouch.TouchEvent

class StreamingLastTouchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000

  test("purchases attribute at arrival: in-lookback touch wins, stale touch falls to direct") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[TouchEvent]
    val q = StreamingLastTouch
      .attributions(stream.toDS())
      .writeStream
      .format("memory")
      .queryName("lt_test")
      .outputMode("append")
      .start()
    try {
      stream.addData(
        TouchEvent(1L, 100L, "click", ts("2024-01-01 10:00:00"), 0.0),
        TouchEvent(1L, 101L, "purchase", ts("2024-01-01 10:10:00"), 5.0)
      )
      q.processAllAvailable()
      // cross-batch carry: the click state persists into the next batch
      stream.addData(TouchEvent(1L, 102L, "purchase", ts("2024-01-01 10:25:00"), 3.0))
      q.processAllAvailable()
      // stale: 40+ minutes after the only touch
      stream.addData(TouchEvent(1L, 103L, "purchase", ts("2024-01-01 11:00:00"), 2.0))
      q.processAllAvailable()
      val got = spark.table("lt_test").as[(Long, Long, Long, String, Long)].collect().toSet
      assert(
        got == Set(
          (1L, 101L, us("2024-01-01 10:10:00"), "click", 50000L),
          (1L, 102L, us("2024-01-01 10:25:00"), "click", 30000L),
          (1L, 103L, us("2024-01-01 11:00:00"), "direct", 20000L)
        ),
        s"got $got"
      )
      // LATE DATA (round-10 review): a purchase older than the watermark
      // (11:00 − 1h = 10:00 after the last batch) must be dropped BEFORE
      // the operator — under GroupStateTimeout.NoTimeout Spark skipped
      // this filter entirely and the stale purchase would attribute
      // 'direct' into the emitted ledger
      stream.addData(TouchEvent(1L, 104L, "purchase", ts("2024-01-01 09:00:00"), 9.0))
      q.processAllAvailable()
      val after = spark.table("lt_test").as[(Long, Long, Long, String, Long)].collect().toSet
      assert(after == got, s"past-watermark purchase leaked into the ledger: ${after -- got}")
    } finally q.stop()
  }

  test("batch mode's per-purchase rows roll up to e22_last_touch exactly") {
    val sf = "/root/testdata/sf0.001"
    val events = graft.sources.Tables
      .events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"), col("value"))
      .as[TouchEvent]
    val streamed = StreamingLastTouch
      .attributions(events)
      .groupBy("touch")
      .agg(count(lit(1)).as("n_purchases"), sum("value_f4").as("revenue_f4"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    val batch = graft.operators.EventOps
      .queries("e22_last_touch")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(streamed.nonEmpty && streamed == batch,
      s"attribution rollups diverged: $streamed vs $batch")
  }
}
