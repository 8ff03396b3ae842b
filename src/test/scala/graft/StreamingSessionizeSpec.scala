package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.SessionEvent

class StreamingSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState emits sessions on gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val q = StreamingSessionize
      .sessionize(stream.toDS(), watermark = "10 minutes")
      .writeStream
      .format("memory")
      .queryName("sessions_test")
      .outputMode("append")
      .start()
    try {
      // user 1: two events 10 min apart (one session), then a 2h gap
      stream.addData(
        SessionEvent(1L, ts("2024-01-01 10:00:00")),
        SessionEvent(1L, ts("2024-01-01 10:10:00"))
      )
      q.processAllAvailable()
      assert(spark.table("sessions_test").count() == 0) // session still open

      // the late event closes the first session (gap > 30 min)...
      stream.addData(SessionEvent(1L, ts("2024-01-01 12:10:00")))
      q.processAllAvailable()
      val afterGap = spark.table("sessions_test").as[(Long, Long, Long, Long)].collect()
      assert(afterGap.length == 1)
      val (uid, startUs, endUs, n) = afterGap.head
      assert(uid == 1L && n == 2L)
      assert((endUs - startUs) == 10L * 60 * 1000000)

      // ...and advancing the watermark far enough times out the second one
      stream.addData(SessionEvent(2L, ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      stream.addData(SessionEvent(2L, ts("2024-01-01 18:00:00")))
      q.processAllAvailable()
      val all = spark.table("sessions_test").as[(Long, Long, Long, Long)].collect()
      assert(all.count(_._1 == 1L) == 2) // both of user 1's sessions emitted
    } finally q.stop()
  }

  test("late data past the watermark is dropped deliberately and COUNTED") {
    // The parity gates run on cleanly closed windows; this fixture proves
    // the out-of-order contract: an event behind the watermark must not
    // mutate emitted sessions (replay determinism), and the drop must be
    // OBSERVABLE in the query's numRowsDroppedByWatermark metric — the
    // no-silent-caps convention applied to time instead of cardinality.
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val q = StreamingSessionize
      .sessionize(stream.toDS(), watermark = "10 minutes")
      .writeStream
      .format("memory")
      .queryName("sessions_late_test")
      .outputMode("append")
      .start()
    try {
      stream.addData(
        SessionEvent(1L, ts("2024-01-01 10:00:00")),
        SessionEvent(1L, ts("2024-01-01 10:05:00"))
      )
      q.processAllAvailable()
      // advance the watermark far past user 1's session and time it out
      stream.addData(SessionEvent(2L, ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      stream.addData(SessionEvent(2L, ts("2024-01-01 15:01:00")))
      q.processAllAvailable()
      val closed = spark.table("sessions_late_test")
        .as[(Long, Long, Long, Long)].collect().filter(_._1 == 1L)
      assert(closed.length == 1 && closed.head._4 == 2L,
        "user 1's session should be closed by the watermark timeout")

      // a late event INSIDE the closed session's range: watermark is
      // ~14:50, the event is hours behind it
      stream.addData(SessionEvent(1L, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      val after = spark.table("sessions_late_test")
        .as[(Long, Long, Long, Long)].collect().filter(_._1 == 1L)
      assert(after.toSeq == closed.toSeq,
        "a late event must not re-open or re-emit a closed session")
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L,
        s"the late event's drop must surface in numRowsDroppedByWatermark, saw $dropped")
    } finally q.stop()
  }

  test("batch mode emits the trailing open session — output equals batch sessionization") {
    // user 1: two sessions (30-min gap rule); user 2: one single-event session
    val events = Seq(
      SessionEvent(1L, ts("2024-01-01 10:00:00")),
      SessionEvent(1L, ts("2024-01-01 10:10:00")),
      SessionEvent(1L, ts("2024-01-01 12:10:00")),
      SessionEvent(2L, ts("2024-01-01 09:00:00"))
    ).toDS()
    val out = StreamingSessionize
      .sessionize(events)
      .collect()
      .map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events))
      .sortBy(t => (t._1, t._2))
    def us(s: String) = ts(s).getTime * 1000
    assert(out.toSeq == Seq(
      (1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:10:00"), 2L),
      (1L, us("2024-01-01 12:10:00"), us("2024-01-01 12:10:00"), 1L),
      (2L, us("2024-01-01 09:00:00"), us("2024-01-01 09:00:00"), 1L)
    ))
  }

  test("streaming sessionization == the declared e2 operator on the real events table") {
    // Cross-module parity on REAL data, not a hand-picked fixture: the
    // flatMapGroupsWithState sessionizer (batch mode) aggregated to e2's
    // per-user shape must equal the oracle-checked e2 window pipeline
    // row-for-row. Both implement the 30-minute gap rule; parity columns
    // are ordering-insensitive (gap splits depend on time values only),
    // so equal-timestamp tie-breaks cannot flake the comparison.
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val events = graft.sources.Tables
      .events(spark, sf)
      .select(col("user_id"), col("ts"))
      .as[graft.streaming.StreamingSessionize.SessionEvent]
    val streamed = graft.streaming.StreamingSessionize
      .sessionize(events)
      .toDF()
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        sum(col("session_end_us") - col("session_start_us")).as("total_span_us"),
        max("n_events").as("max_session_events")
      )
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val batch = graft.operators.EventOps
      .queries("e2_sessionize")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming/batch sessionization diverged: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }
}
