package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.WeeklyActivity

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val events = Seq(
    Ev(Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0), // Mon
    Ev(Timestamp.valueOf("2024-01-03 10:00:00"), 2L, "click", 2.0),
    Ev(Timestamp.valueOf("2024-01-07 23:00:00"), 1L, "view", 3.0),  // Sun
    Ev(Timestamp.valueOf("2024-01-08 00:00:00"), 3L, "click", 4.0)  // next Mon
  )

  test("weekly window is Monday-anchored and batch/stream plans agree") {
    // batch side
    val batch = WeeklyActivity
      .weeklyCounts(events.toDF())
      .orderBy("week_start", "event_type")
      .collect()
    assert(
      batch.map(r => (r.getDate(0).toString, r.getString(1), r.getLong(3))).toSeq ==
        Seq(
          ("2024-01-01", "click", 2L),
          ("2024-01-01", "view", 1L),
          ("2024-01-08", "click", 1L)
        )
    )

    // streaming side: same transform over a MemoryStream, complete mode
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(events: _*)
    val q = WeeklyActivity
      .weeklyCounts(stream.toDF())
      .writeStream
      .format("memory")
      .queryName("weekly_test")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark
      .table("weekly_test")
      .orderBy("week_start", "event_type")
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(3)))
      .toSeq
    assert(streamed == batch.map(r => (r.getDate(0).toString, r.getString(1), r.getLong(3))).toSeq)
  }
}
