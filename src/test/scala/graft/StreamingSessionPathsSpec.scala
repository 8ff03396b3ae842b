package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingSessionPaths
import graft.streaming.StreamingSessionPaths.PathEvent

class StreamingSessionPathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("paths close on gap/timeout; a late in-watermark event takes its TRUE position") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[PathEvent]
    val q = StreamingSessionPaths
      .sessionPaths(stream.toDS(), watermark = "20 minutes")
      .writeStream
      .format("memory")
      .queryName("paths_test")
      .outputMode("append")
      .start()
    try {
      // batch 1: click(10:00), view(10:10) — session open
      stream.addData(
        PathEvent(1L, 100L, "click", ts("2024-01-01 10:00:00")),
        PathEvent(1L, 101L, "view", ts("2024-01-01 10:10:00"))
      )
      q.processAllAvailable()
      // batch 2: a LATE but in-watermark event at 10:05 must interleave
      // between them (arrival order is 3rd, true order is 2nd)
      stream.addData(PathEvent(1L, 102L, "scroll", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(spark.table("paths_test").count() == 0, "open session emitted early")
      // a later event proves the gap: the closed path is ordered by time
      stream.addData(PathEvent(1L, 103L, "purchase", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val closed = spark.table("paths_test")
        .as[(Long, Long, Long, Long, String)].collect()
      assert(closed.length == 1)
      assert(closed.head._5 == "click>scroll>view",
        s"late event must sort into true position: ${closed.head._5}")
      assert(closed.head._4 == 3L)
    } finally q.stop()
  }

  test("batch mode reproduces e18's top-20 paths exactly on the real events table") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val events = graft.sources.Tables
      .events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .as[PathEvent]
    val streamed = StreamingSessionPaths
      .sessionPaths(events)
      .toDF()
      .groupBy("path")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events")
      )
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(20)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val batch = graft.operators.EventOps
      .queries("e18_session_paths")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming/batch paths diverged: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }
}
