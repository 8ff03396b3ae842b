package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingCadence
import graft.streaming.StreamingCadence.CadenceEvent

class StreamingCadenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gaps emit per arrival across batches; cross-batch out-of-order is marked, not silent") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[CadenceEvent]
    val q = StreamingCadence
      .gapIncrements(stream.toDS(), watermark = "2 hours")
      .writeStream
      .format("memory")
      .queryName("cad_test")
      .outputMode("append")
      .start()
    try {
      stream.addData(
        CadenceEvent(1L, "click", 100L, ts("2024-01-01 10:00:00")),
        CadenceEvent(1L, "click", 101L, ts("2024-01-01 10:00:01"))
      )
      q.processAllAvailable()
      // cross-batch gap uses the carried last timestamp
      stream.addData(CadenceEvent(1L, "click", 102L, ts("2024-01-01 10:00:03")))
      q.processAllAvailable()
      val got = spark.table("cad_test").as[(String, Long, Int, Long)].collect().toSeq
      // 1s gap -> bucket 20 (1e6 us); 2s gap -> bucket 21
      assert(got.sortBy(_._4) == Seq(
        ("click", 1L, StreamingCadence.bitLen(1000000L), 1000000L),
        ("click", 1L, StreamingCadence.bitLen(2000000L), 2000000L)
      ), s"got $got")

      // an in-watermark arrival OLDER than state: emits the -1 marker
      stream.addData(CadenceEvent(1L, "click", 103L, ts("2024-01-01 10:00:02")))
      q.processAllAvailable()
      val markers = spark.table("cad_test").as[(String, Long, Int, Long)].collect()
        .filter(_._3 == -1)
      assert(markers.length == 1, "out-of-order arrival must be counted via the marker row")

      // LATE DATA (round-10 review): a PAST-WATERMARK arrival is dropped
      // before the operator — not even a marker row. Under NoTimeout the
      // watermark never filtered, so arbitrarily-late events could still
      // mutate the published histogram. Watermark here is 2h behind
      // 10:00:03, so 2024-01-01 07:00:00 is late.
      val before = spark.table("cad_test").count()
      stream.addData(CadenceEvent(1L, "click", 104L, ts("2024-01-01 07:00:00")))
      q.processAllAvailable()
      assert(spark.table("cad_test").count() == before,
        "past-watermark arrival must produce no row at all")
    } finally q.stop()
  }

  test("batch mode's aggregated increments == e24_cadence_histogram on the real events table") {
    val sf = "/root/testdata/sf0.001"
    val events = graft.sources.Tables
      .events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .as[CadenceEvent]
    val streamed = StreamingCadence
      .gapIncrements(events)
      .groupBy("event_type", "bucket")
      .agg(
        count(lit(1)).as("n_gaps"),
        min("gap_us").as("min_gap_us"),
        max("gap_us").as("max_gap_us")
      )
      .collect()
      .map(r => ((r.getString(0), r.getInt(1).toLong), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val batch = graft.operators.EventOps
      .queries("e24_cadence_histogram")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(streamed.nonEmpty && streamed == batch,
      s"cadence profiles diverged: only-streamed ${(streamed.keySet -- batch.keySet).take(3)}, " +
        s"only-batch ${(batch.keySet -- streamed.keySet).take(3)}")
  }
}
