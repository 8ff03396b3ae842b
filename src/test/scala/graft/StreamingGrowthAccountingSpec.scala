package graft

import java.sql.Timestamp
import java.time.LocalDate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingGrowthAccounting
import graft.streaming.StreamingGrowthAccounting.GaEvent

class StreamingGrowthAccountingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def wd(s: String): Int = LocalDate.parse(s).toEpochDay.toInt

  test("arrival-proven and timer-proven churn each fire exactly once; returns resurrect") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[GaEvent]
    val q = StreamingGrowthAccounting
      .growthContributions(stream.toDS(), watermark = "1 hour")
      .writeStream
      .format("memory")
      .queryName("ga_test")
      .outputMode("append")
      .start()
    try {
      // user 1: new, then retained; user 2: new, then silent
      stream.addData(
        GaEvent("click", 1L, ts("2024-01-01 10:00:00")),
        GaEvent("click", 2L, ts("2024-01-01 11:00:00"))
      )
      q.processAllAvailable()
      stream.addData(GaEvent("click", 1L, ts("2024-01-08 10:00:00")))
      q.processAllAvailable()
      val early = spark.table("ga_test").as[(String, Long, Int, String)].collect().toSet
      assert(
        early == Set(
          ("click", 1L, wd("2024-01-01"), "new"),
          ("click", 2L, wd("2024-01-01"), "new"),
          ("click", 1L, wd("2024-01-08"), "retained")
        ),
        s"got $early"
      )

      // user 1 skips a week and returns: the GAP proves churn at 01-15,
      // the return is a resurrection — both in one micro-batch
      stream.addData(GaEvent("click", 1L, ts("2024-01-22 09:00:00")))
      q.processAllAvailable()
      val afterGap = spark.table("ga_test").as[(String, Long, Int, String)].collect().toSet
      assert(afterGap.contains(("click", 1L, wd("2024-01-15"), "churned")))
      assert(afterGap.contains(("click", 1L, wd("2024-01-22"), "resurrected")))

      // the watermark retiring week 01-08 fires user 2's TIMER churn
      // (timeout at 01-15 00:00; watermark must pass it => event at
      // 01-15 01:30 with 1h delay)
      stream.addData(GaEvent("click", 3L, ts("2024-01-15 01:30:00")))
      q.processAllAvailable()
      stream.addData(GaEvent("click", 3L, ts("2024-01-15 02:30:00")))
      q.processAllAvailable()
      val afterTimer = spark.table("ga_test").as[(String, Long, Int, String)].collect()
      assert(afterTimer.count(r => r._2 == 2L && r._4 == "churned") == 1,
        s"user 2 must churn exactly once via timer: ${afterTimer.toSeq.filter(_._2 == 2L)}")
      assert(afterTimer.count(r => r._2 == 2L && r._4 == "churned" && r._3 == wd("2024-01-08")) == 1)

      // user 2 returns much later: resurrected, and NO second churn for
      // the already-flagged week
      stream.addData(GaEvent("click", 2L, ts("2024-02-05 10:00:00")))
      q.processAllAvailable()
      val fin = spark.table("ga_test").as[(String, Long, Int, String)].collect()
      assert(fin.count(r => r._2 == 2L && r._4 == "churned") == 1)
      assert(fin.count(r => r._2 == 2L && r._4 == "resurrected" && r._3 == wd("2024-02-05")) == 1)
    } finally q.stop()
  }

  test("a past-watermark event changes nothing and is counted in numRowsDroppedByWatermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[GaEvent]
    val q = StreamingGrowthAccounting
      .growthContributions(stream.toDS(), watermark = "1 hour")
      .writeStream
      .format("memory")
      .queryName("ga_late_test")
      .outputMode("append")
      .start()
    try {
      stream.addData(GaEvent("view", 1L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      stream.addData(GaEvent("view", 1L, ts("2024-02-01 10:00:00")))
      q.processAllAvailable()
      val before = spark.table("ga_late_test").as[(String, Long, Int, String)].collect().toSet
      // a week-old event far behind the watermark: would have been
      // 'retained' at 01-08 — must instead be dropped, and COUNTED
      stream.addData(GaEvent("view", 1L, ts("2024-01-08 10:00:00")))
      q.processAllAvailable()
      val after = spark.table("ga_late_test").as[(String, Long, Int, String)].collect().toSet
      assert(after == before, "late event must not rewrite the ledger")
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L, s"late drop must surface in the metric, saw $dropped")
    } finally q.stop()
  }

  test("batch mode's aggregated contributions == e21_growth_accounting on the real events table") {
    val sf = "/root/testdata/sf0.001"
    val events = graft.sources.Tables
      .events(spark, sf)
      .select(col("event_type"), col("user_id"), col("ts"))
      .as[GaEvent]
    val maxw = graft.sources.Tables
      .events(spark, sf)
      .select(max(graft.functions.F.weekStart(col("ts"))))
      .head()
      .getDate(0)
      .toLocalDate
      .toEpochDay
      .toInt
    val streamed = StreamingGrowthAccounting
      .growthContributions(events, maxWeekDays = Some(maxw))
      .groupBy("event_type", "week_days")
      .pivot("cls", Seq("new", "retained", "resurrected", "churned"))
      .count()
      .na.fill(0L)
      .collect()
      .map(r => ((r.getString(0), r.getInt(1).toLong), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val batch = graft.operators.EventOps
      .queries("e21_growth_accounting")(spark, sf)
      .collect()
      .map(r =>
        ((r.getString(0), r.getDate(1).toLocalDate.toEpochDay),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      )
      .toMap
    assert(streamed.nonEmpty)
    // every e21 row must be matched exactly; contribution weeks absent
    // from e21 (none on this data) would surface as extra keys
    assert(streamed == batch,
      s"ledger diverged: only-streamed ${(streamed.keySet -- batch.keySet).take(3)}, " +
        s"only-batch ${(batch.keySet -- streamed.keySet).take(3)}, " +
        s"value diffs ${batch.keySet.intersect(streamed.keySet).filter(k => batch(k) != streamed(k)).take(3)}")
  }
}
