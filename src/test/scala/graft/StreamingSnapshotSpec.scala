package graft

import java.sql.Timestamp
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingSnapshot

final case class SnapshotEv(ts: Timestamp, user_id: Long, event_type: String)

class StreamingSnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("closed weekly windows land week-partitioned; re-delivery replaces, not duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("snap_out").toString
    val ckpt = Files.createTempDirectory("snap_ckpt").toString
    val stream = MemoryStream[SnapshotEv]
    val q = StreamingSnapshot.start(
      stream.toDS().toDF(),
      out,
      ckpt,
      watermark = "1 day"
    )
    try {
      // Monday week of 2024-01-01 (the repo-wide weekly anchor): 3 events
      stream.addData(
        SnapshotEv(ts("2024-01-04 10:00:00"), 1L, "click"),
        SnapshotEv(ts("2024-01-05 11:00:00"), 2L, "click"),
        SnapshotEv(ts("2024-01-06 12:00:00"), 1L, "view")
      )
      q.processAllAvailable()
      // an event two weeks later pushes the watermark past the window end
      stream.addData(SnapshotEv(ts("2024-01-20 00:00:00"), 3L, "click"))
      q.processAllAvailable()

      val snap = spark.read.parquet(out)
      val clicks = snap.filter(col("event_type") === "click").collect()
      assert(clicks.length == 1 && clicks.head.getAs[Long]("n_events") == 2L)
      assert(snap.filter(col("event_type") === "view").count() == 1)
      // layout: one directory per closed week
      val weekDirs = new java.io.File(out)
        .listFiles().map(_.getName).count(_.startsWith("week_start="))
      assert(weekDirs >= 1)

      // idempotence: re-running the writer with the same delivered batch
      // replaces the week partition instead of duplicating it — the
      // checkpoint-replay / backfill case. Replay carries the FULL week
      // (that is what a micro-batch delivers: append mode emits every
      // group of a window in the batch where the watermark closes it).
      val snapCount = snap.count()
      val week = snap.select("week_start").head().getDate(0)
      // materialize the replay rows first — a lazy reader over `out`
      // would be overwritten mid-scan by the very write it feeds
      val weekDf = snap.filter(col("week_start") === lit(week))
      val replay = spark.createDataFrame(
        spark.sparkContext.parallelize(weekDf.collect().toSeq),
        weekDf.schema
      )
      StreamingSnapshot.writeSnapshot(replay, out)
      val after = spark.read.parquet(out)
      assert(after.filter(col("event_type") === "click").count() == 1)
      assert(after.filter(col("event_type") === "view").count() == 1)
      assert(after.count() == snapCount)
    } finally q.stop()
  }
}
