package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingScdIntervals
import graft.streaming.StreamingScdIntervals.ScdEvent

class StreamingScdIntervalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000

  test("a type change closes the open version; quiet timeout emits the current one") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[ScdEvent]
    val q = StreamingScdIntervals
      .scdIntervals(stream.toDS(), watermark = "10 minutes", quietUs = 30L * 60 * 1000000)
      .writeStream
      .format("memory")
      .queryName("scd_test")
      .outputMode("append")
      .start()
    try {
      stream.addData(
        ScdEvent(1L, 100L, "free", ts("2024-01-01 10:00:00")),
        ScdEvent(1L, 101L, "free", ts("2024-01-01 10:05:00"))
      )
      q.processAllAvailable()
      assert(spark.table("scd_test").count() == 0, "open version emitted early")

      // the upgrade event closes 'free' with valid_to = its own time
      stream.addData(ScdEvent(1L, 102L, "paid", ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      val closed = spark.table("scd_test")
        .as[(Long, Long, String, Long, Option[Long], Long)].collect()
      assert(closed.toSeq == Seq(
        (1L, 1L, "free", us("2024-01-01 10:00:00"), Some(us("2024-01-01 10:20:00")), 2L)
      ), s"got ${closed.toSeq}")

      // push the watermark past the quiet horizon (10:20 + 30min, +10min
      // watermark delay) via another user
      stream.addData(ScdEvent(2L, 200L, "free", ts("2024-01-01 11:30:00")))
      q.processAllAvailable()
      stream.addData(ScdEvent(2L, 201L, "free", ts("2024-01-01 11:31:00")))
      q.processAllAvailable()
      val all = spark.table("scd_test")
        .as[(Long, Long, String, Long, Option[Long], Long)].collect()
      val current = all.filter(r => r._1 == 1L && r._2 == 2L)
      assert(current.toSeq == Seq(
        (1L, 2L, "paid", us("2024-01-01 10:20:00"), None, 1L)
      ), s"quiet timeout should emit the current 'paid' version: ${all.toSeq}")

      // ordinal CONTINUES after the timeout (round-10 review): user 1's
      // next event must open seg_id 3, not restart at 1 — a restart would
      // seat two different rows under (user 1, seg 1) and leave two
      // CURRENT versions in the emitted SCD table
      stream.addData(ScdEvent(1L, 103L, "paid", ts("2024-01-01 11:32:00")))
      q.processAllAvailable()
      // close it with a type change so the new ordinal is observable
      stream.addData(ScdEvent(1L, 104L, "free", ts("2024-01-01 11:40:00")))
      q.processAllAvailable()
      val reopened = spark.table("scd_test")
        .as[(Long, Long, String, Long, Option[Long], Long)].collect()
        .filter(r => r._1 == 1L && r._3 == "paid" && r._5.isDefined)
      assert(reopened.toSeq == Seq(
        (1L, 3L, "paid", us("2024-01-01 11:32:00"), Some(us("2024-01-01 11:40:00")), 1L)
      ), s"post-timeout segment must take ordinal 3: ${reopened.toSeq}")
    } finally q.stop()
  }

  test("batch mode reproduces e20_scd_intervals row-for-row on the real events table") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val events = graft.sources.Tables
      .events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .as[ScdEvent]
    val streamed = StreamingScdIntervals
      .scdIntervals(events)
      .toDF()
      .orderBy("user_id", "seg_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
      .toSeq
    val batch = graft.operators.EventOps
      .queries("e20_scd_intervals")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
      .toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming/batch SCD diverged: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }
}
