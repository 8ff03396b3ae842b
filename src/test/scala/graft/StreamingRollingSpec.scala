package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.RollingActive

/** The streaming sliding-window actives path: batch/stream agreement on
  * one code path, and the approx error envelope vs the EXACT batch e7.
  */
class StreamingRollingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sliding 7-day window agrees batch vs stream and tracks exact e7") {
    // exact per-day actives from the batch operator over driver testdata
    val sf = "/root/testdata/sf0.01"
    val exact = graft.operators.EventOps
      .queries("e7_rolling_active")(spark, sf)
      .collect()
      .map(r => r.getDate(0).toString -> r.getLong(2))
      .toMap

    val ev = graft.sources.Tables
      .events(spark, sf)
      .select(col("ts"), col("user_id"))

    // batch evaluation of the streaming transform
    val batch = RollingActive
      .rollingActive(ev)
      .collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))
      .toMap
    // every exact as-of day is present and within HLL tolerance (2% rsd
    // at these cardinalities -> allow 10%)
    assert(exact.nonEmpty)
    exact.foreach { case (day, n) =>
      val approx = batch.getOrElse(day, fail(s"day $day missing"))
      assert(math.abs(approx - n).toDouble / n <= 0.1, s"$day: $approx vs exact $n")
    }

    // streaming evaluation over a MemoryStream of the same rows: the
    // plan is the same transform; complete mode lets every window emit
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    stream.addData(ev.as[(Timestamp, Long)].collect().toSeq: _*)
    val q = RollingActive
      .rollingActive(
        stream.toDF().toDF("ts", "user_id")
      )
      .writeStream
      .format("memory")
      .queryName("rolling_test")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark
      .table("rolling_test")
      .collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))
      .toMap
    assert(streamed == batch, "batch and streaming disagree on one code path")
  }
}
