package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingConcurrency
import graft.streaming.StreamingConcurrency.{ConcInterval, DayUs}

/** 21st streaming module: continuous concurrency monitoring, gated
  * against declared j10b with an INDEPENDENT driver-side sessionizer
  * building the interval stream, plus the straggler-marker contract. */
class StreamingConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val GapUs = 30L * 60 * 1000000

  /** Independent reference sessionizer (driver-side, not the module's or
    * EventOps' code): per user, sort by (us, event_id), split on >gap. */
  private lazy val intervals: Vector[ConcInterval] = {
    val ev = graft.sources.Tables
      .events(spark, dir)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us")
      .as[(Long, Long, Long)]
      .collect()
    ev.groupBy(_._1)
      .toVector
      .flatMap { case (uid, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._2))
        val sessions = Vector.newBuilder[(Long, Long)]
        var start = sorted.head._3
        var last = sorted.head._3
        sorted.tail.foreach { r =>
          if (r._3 - last > GapUs) { sessions += ((start, last)); start = r._3 }
          last = r._3
        }
        sessions += ((start, last))
        sessions.result().map { case (s, e) =>
          ConcInterval(uid, s, e, new Timestamp(e / 1000))
        }
      }
      .sortBy(iv => (iv.ts.getTime, iv.user_id, iv.s_us))
  }

  private lazy val j10bRows: Map[Long, (Long, Long)] =
    SparkEntry
      .queries("j10b_concurrency_profile")(spark, dir)
      .as[(Long, Long, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap

  test("batch mode over independently-built intervals equals declared j10b row-for-row") {
    val got = StreamingConcurrency
      .concurrencyRows(intervals.toDS())
      .collect()
      .map(o => o.day_num -> ((o.n_sessions, o.max_concurrent)))
      .toMap
    assert(got == j10bRows, s"only-module=${got.toSet -- j10bRows.toSet} only-j10b=${j10bRows.toSet -- got.toSet}")
  }

  test("streamed days close via the maxSpan timer and match batch; stragglers yield counted markers") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[ConcInterval]
    val q = StreamingConcurrency
      .concurrencyRows(stream.toDS(), watermark = "1 hour", maxSpanDays = 2)
      .writeStream
      .format("memory")
      .queryName("conc_test")
      .outputMode("append")
      .start()
    try {
      intervals.grouped(intervals.size / 3 + 1).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
      // a far-future one-day sentinel pushes the watermark past every
      // January day's (end + maxSpan) timer
      val sentUs = Timestamp.valueOf("2024-03-01 12:00:00").getTime * 1000
      stream.addData(ConcInterval(999999L, sentUs, sentUs + 1000000, new Timestamp(sentUs / 1000 + 1000)))
      q.processAllAvailable()
      stream.addData(ConcInterval(999998L, sentUs, sentUs + 1000000, new Timestamp(sentUs / 1000 + 2000)))
      q.processAllAvailable()
      val emitted = spark
        .table("conc_test")
        .as[(Long, Long, Long)]
        .collect()
        .filter(_._3 >= 0) // closed-day rows only
        .map(r => r._1 -> ((r._2, r._3)))
        .toMap
      assert(emitted == j10bRows,
        s"closed stream days != batch: only-stream=${emitted.toSet -- j10bRows.toSet} only-batch=${j10bRows.toSet -- emitted.toSet}")

      // straggler: an in-watermark session SPANNING back into a closed
      // day (longer than maxSpan) — its early pieces must surface as
      // counted markers (n pieces, max_concurrent = −1), never silently
      val backS = Timestamp.valueOf("2024-01-05 06:00:00").getTime * 1000
      val backE = sentUs + 2000000
      stream.addData(ConcInterval(999997L, backS, backE, new Timestamp(backE / 1000)))
      q.processAllAvailable()
      val markers = spark
        .table("conc_test")
        .as[(Long, Long, Long)]
        .collect()
        .filter(_._3 == -1L)
      val jan5 = backS / DayUs
      assert(markers.exists(m => m._1 == jan5 && m._2 == 1L),
        s"no straggler marker for day $jan5: ${markers.toSeq}")
    } finally q.stop()
  }
}
