package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDistinct
import graft.streaming.StreamingDistinct.IdEvent

class StreamingDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ids repeating across micro-batches count once; emission on watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[IdEvent]
    val q = StreamingDistinct
      .distinctPerWindow(stream.toDS(), shards = 4, watermark = "30 minutes")
      .writeStream
      .format("memory")
      .queryName("sd_test")
      .outputMode("append")
      .start()
    try {
      // batch 1: ids 1..10 in window [10:00, 11:00)
      stream.addData((1L to 10L).map(i => IdEvent(ts("2024-01-01 10:05:00"), "k", i)): _*)
      q.processAllAvailable()
      // batch 2: ids 6..15 — 5 repeats, 5 new, SAME window (state merge)
      stream.addData((6L to 15L).map(i => IdEvent(ts("2024-01-01 10:20:00"), "k", i)): _*)
      q.processAllAvailable()
      assert(spark.table("sd_test").count() == 0, "window emitted before close")

      // push the watermark past 11:00
      stream.addData(IdEvent(ts("2024-01-01 13:00:00"), "k", 999L))
      q.processAllAvailable()
      val rows = spark
        .table("sd_test")
        .as[(Long, String, Int, Long)]
        .collect()
        .toSeq
      assert(rows.nonEmpty, "window did not emit on watermark close")
      assert(rows.forall(_._1 == ts("2024-01-01 10:00:00").getTime * 1000))
      // shards partition the id domain: the sum is the exact distinct
      assert(rows.map(_._4).sum == 15L, s"expected 15 distinct, got $rows")
    } finally q.stop()
  }

  test("late ids past the watermark don't change a closed window's count — and are counted as drops") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[IdEvent]
    val q = StreamingDistinct
      .distinctPerWindow(stream.toDS(), shards = 4, watermark = "30 minutes")
      .writeStream
      .format("memory")
      .queryName("sd_late_test")
      .outputMode("append")
      .start()
    try {
      stream.addData((1L to 10L).map(i => IdEvent(ts("2024-01-01 10:05:00"), "k", i)): _*)
      q.processAllAvailable()
      // close the [10:00, 11:00) window
      stream.addData(IdEvent(ts("2024-01-01 13:00:00"), "k", 999L))
      q.processAllAvailable()
      val closed = spark.table("sd_late_test").as[(Long, String, Int, Long)].collect()
        .filter(_._1 == ts("2024-01-01 10:00:00").getTime * 1000)
      assert(closed.map(_._4).sum == 10L, "closed window should hold exactly ids 1..10")

      // a NEW id aimed at the closed window, hours behind the watermark:
      // the exact count must not change (no re-emission, no mutation),
      // and the drop must register in the metric — deliberate, counted
      stream.addData(IdEvent(ts("2024-01-01 10:06:00"), "k", 888L))
      q.processAllAvailable()
      val after = spark.table("sd_late_test").as[(Long, String, Int, Long)].collect()
        .filter(_._1 == ts("2024-01-01 10:00:00").getTime * 1000)
      assert(after.toSeq.sorted == closed.toSeq.sorted,
        "late id must not alter the closed window's emitted counts")
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L,
        s"late-id drop must surface in numRowsDroppedByWatermark, saw $dropped")
    } finally q.stop()
  }

  test("streaming shard sums == e14's weekly exact distinct on the real events table") {
    // Cross-module parity on REAL data: batch-mode flatMapGroupsWithState
    // bitmap state, summed across id shards and rolled up from hourly
    // windows to e14's weekly grain, must reproduce the oracle-checked
    // e14 exact_users column row-for-row. Hourly→weekly rollup is only
    // valid through the bitmap (sets union; counts don't) — so the
    // streaming side aggregates per-week directly here (7-day windows
    // aligned to e14's Monday-start date_trunc weeks).
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val events = graft.sources.Tables
      .events(spark, sf)
      .select(
        col("ts"),
        col("event_type").as("key"),
        col("user_id").as("id")
      )
      .as[IdEvent]
    // 7-day tumbling windows; epoch day 0 (1970-01-01) was a Thursday
    // and Mondays sit at epoch-day ≡ 4 (mod 7), so shift ts BACK 4 days,
    // floor on the epoch week grid, and shift the window start FORWARD
    // 4 days — that reproduces date_trunc('week')'s Monday starts
    val weekUs = 7L * 24 * 3600 * 1000000
    val shifted = events
      .withColumn("ts", expr("timestampadd(DAY, -4, ts)"))
      .as[IdEvent]
    val streamed = StreamingDistinct
      .distinctPerWindow(shifted, windowUs = weekUs, shards = 4)
      .toDF()
      .groupBy(
        to_date(
          expr(s"timestampadd(DAY, 4, timestamp_micros(window_start_us))")
        ).as("week_start"),
        col("key").as("event_type")
      )
      .agg(sum("n_distinct").as("exact_users"))
      .orderBy("week_start", "event_type")
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
      .toSeq
    val batch = graft.operators.EventOps
      .queries("e14_bitmap_rollup")(spark, sf)
      .select("week_start", "event_type", "exact_users")
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
      .toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming/batch distinct diverged: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }
}
