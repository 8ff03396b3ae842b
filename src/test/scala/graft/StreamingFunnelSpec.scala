package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.FunnelEvent

class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000

  test("a purchase arriving BEFORE its (earlier) signup still converts — cross-batch, in-watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[FunnelEvent]
    val q = StreamingFunnel
      .transitions(stream.toDS())
      .writeStream
      .format("memory")
      .queryName("funnel_ooo")
      .outputMode("append")
      .start()
    try {
      // batch 1: the purchase shows up first (stream order ≠ event order)
      stream.addData(FunnelEvent(1L, 100L, "purchase", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      assert(spark.table("funnel_ooo").isEmpty, "unanchored purchase must not emit")
      // batch 2: the signup lands with an EARLIER event time, inside the
      // 1h watermark — the buffered purchase retro-qualifies
      stream.addData(FunnelEvent(1L, 101L, "signup", ts("2024-01-01 09:30:00")))
      q.processAllAvailable()
      val got = spark.table("funnel_ooo").as[(Long, Long, String)].collect().toSet
      assert(
        got == Set(
          (1L, us("2024-01-01 09:30:00"), "signup"),
          (1L, us("2024-01-01 10:00:00"), "converted")
        ),
        s"got $got"
      )
    } finally q.stop()
  }

  test("the 7-day horizon is enforced and conversion emits exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[FunnelEvent]
    val q = StreamingFunnel
      .transitions(stream.toDS())
      .writeStream
      .format("memory")
      .queryName("funnel_hz")
      .outputMode("append")
      .start()
    try {
      stream.addData(
        FunnelEvent(2L, 200L, "signup", ts("2024-01-01 00:00:00")),
        // 8 days out: beyond horizon, dropped on sight (anchor can only
        // move EARLIER, which moves the window further away)
        FunnelEvent(2L, 201L, "purchase", ts("2024-01-09 00:00:00"))
      )
      q.processAllAvailable()
      stream.addData(
        FunnelEvent(2L, 202L, "purchase", ts("2024-01-09 12:00:00")),
        FunnelEvent(2L, 203L, "purchase", ts("2024-01-09 13:00:00"))
      )
      q.processAllAvailable()
      val got = spark.table("funnel_hz").as[(Long, Long, String)].collect().toSet
      assert(got == Set((2L, us("2024-01-01 00:00:00"), "signup")), s"got $got")
    } finally q.stop()
  }

  test("a past-watermark signup changes nothing and is counted in numRowsDroppedByWatermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[FunnelEvent]
    val q = StreamingFunnel
      .transitions(stream.toDS(), watermark = "1 hour")
      .writeStream
      .format("memory")
      .queryName("funnel_late")
      .outputMode("append")
      .start()
    try {
      stream.addData(FunnelEvent(3L, 300L, "purchase", ts("2024-01-02 12:00:00")))
      q.processAllAvailable()
      // watermark is now ~2024-01-02 11:00; a signup from 09:00 the
      // previous day is hopelessly late — dropped BEFORE the operator
      stream.addData(FunnelEvent(3L, 301L, "signup", ts("2024-01-01 09:00:00")))
      q.processAllAvailable()
      assert(spark.table("funnel_late").isEmpty, "late signup must not resurrect the funnel")
      val dropped = q.recentProgress
        .flatMap(Option(_))
        .flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark)
        .sum
      assert(dropped >= 1,
        s"the late signup's drop must surface in numRowsDroppedByWatermark, saw $dropped")
    } finally q.stop()
  }

  test("signed-up state is retired once the watermark passes the 7-day horizon") {
    // The long-running-stream bound: without horizon expiry, every
    // one-time signup (unconverted) and every conversion tombstone is a
    // permanent state-store entry. Drive the watermark past
    // signup + 7 days via an unrelated user and assert the store drains
    // to just the in-horizon entries.
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[FunnelEvent]
    val q = StreamingFunnel
      .transitions(stream.toDS(), watermark = "1 hour")
      .writeStream
      .format("memory")
      .queryName("funnel_expiry")
      .outputMode("append")
      .start()
    try {
      stream.addData(
        // user 10: signs up, never purchases (the leak case)
        FunnelEvent(10L, 500L, "signup", ts("2024-01-01 00:00:00")),
        // user 11: signs up and converts (the tombstone case)
        FunnelEvent(11L, 501L, "signup", ts("2024-01-01 00:00:00")),
        FunnelEvent(11L, 502L, "purchase", ts("2024-01-01 01:00:00"))
      )
      q.processAllAvailable()
      def stateRows: Long = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 2L, s"expected both users in state, saw $stateRows")
      // an unrelated user 12 days later pushes the watermark past
      // 2024-01-08 (signup + horizon); the expiry timers fire
      stream.addData(FunnelEvent(12L, 503L, "signup", ts("2024-01-13 00:00:00")))
      q.processAllAvailable()
      // one more empty-ish batch so timer emissions are fully processed
      stream.addData(FunnelEvent(12L, 504L, "view", ts("2024-01-13 00:00:01")))
      q.processAllAvailable()
      assert(stateRows == 1L, s"expired entries must be removed, saw $stateRows")
      val got = spark.table("funnel_expiry").as[(Long, Long, String)].collect().toSet
      assert(
        got == Set(
          (10L, us("2024-01-01 00:00:00"), "signup"),
          (11L, us("2024-01-01 00:00:00"), "signup"),
          (11L, us("2024-01-01 01:00:00"), "converted"),
          (12L, us("2024-01-13 00:00:00"), "signup")
        ),
        s"expiry must not change emissions, got $got"
      )
    } finally q.stop()
  }

  test("batch mode's transition rows roll up to e4_funnel exactly") {
    val sf = "/root/testdata/sf0.001"
    val events = graft.sources.Tables
      .events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .as[FunnelEvent]
    val rows = StreamingFunnel.transitions(events)
    val streamed = rows
      .groupBy()
      .agg(
        sum(when(col("kind") === "signup", 1L).otherwise(0L)).as("n_signed_up_users"),
        sum(when(col("kind") === "converted", 1L).otherwise(0L)).as("n_converted")
      )
      .withColumn(
        "conversion_rate",
        graft.functions.F.safeDiv(col("n_converted"), col("n_signed_up_users"))
      )
      .collect()
      .head
    val batch = graft.operators.EventOps
      .queries("e4_funnel")(spark, sf)
      .collect()
      .head
    assert(streamed.getLong(0) == batch.getLong(0), "signup counts diverged")
    assert(streamed.getLong(1) == batch.getLong(1), "conversion counts diverged")
    assert(streamed.get(2) == batch.get(2), "conversion rate diverged")
    assert(batch.getLong(0) > 0, "fixture must actually contain signups")
  }
}
