package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.FunnelEvent

/** Checkpoint RECOVERY e2e for a stateful, timer-carrying module — the
  * operational property the per-module parity gates don't cover: a query
  * killed between micro-batches and restarted from its checkpoint must
  * (a) resume with its buffered state intact (a purchase buffered before
  * the stop still converts when its signup arrives after the restart),
  * (b) neither re-emit nor lose any pre-stop emission, and (c) re-arm
  * its event-time timers (post-restart watermark movement still expires
  * horizon-passed state).
  *
  * MemoryStream cannot restart (offsets live in the JVM), so the stream
  * is a FILE source — files written between phases are the micro-batch
  * boundary — feeding a parquet sink; both ends are checkpoint-tracked,
  * which is exactly the production exactly-once wiring.
  */
class StreamingRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000

  private val schema = StructType(
    Seq(
      StructField("user_id", LongType),
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("ts", TimestampType)
    )
  )

  private def writeBatch(dir: String, name: String, rows: Seq[FunnelEvent]): Unit =
    rows.toDF().coalesce(1).write.json(s"$dir/$name")

  test("funnel resumes from checkpoint: buffered state survives, no emission duplicated or lost, timers re-arm") {
    val root = java.nio.file.Files.createTempDirectory("graft-recovery").toString
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()

    def run(): Unit = {
      val events = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(s"$srcDir/*/")
        .as[FunnelEvent]
      val q = StreamingFunnel
        .transitions(events, watermark = "1 hour")
        .writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/chk")
        .outputMode("append")
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }

    def emitted: Set[(Long, Long, String)] = spark.read
      .parquet(s"$root/out")
      .as[(Long, Long, String)]
      .collect()
      .toSet

    // ---- phase 1: u2 completes a signup (emitted), u1's purchase is
    // buffered UNANCHORED in state; then the query stops (the "kill
    // between micro-batches": offsets + state committed to checkpoint)
    writeBatch(srcDir, "b1", Seq(
      FunnelEvent(2L, 10L, "signup", ts("2024-01-01 10:00:00")),
      FunnelEvent(1L, 11L, "purchase", ts("2024-01-01 10:00:00"))
    ))
    run()
    assert(emitted == Set((2L, us("2024-01-01 10:00:00"), "signup")),
      s"phase 1 emissions wrong: $emitted")

    // ---- phase 2: restart from the checkpoint; u1's EARLIER signup
    // arrives — conversion requires the purchase buffered BEFORE the stop
    writeBatch(srcDir, "b2", Seq(
      FunnelEvent(1L, 12L, "signup", ts("2024-01-01 09:30:00"))
    ))
    run()
    assert(
      emitted == Set(
        (2L, us("2024-01-01 10:00:00"), "signup"),
        (1L, us("2024-01-01 09:30:00"), "signup"),
        (1L, us("2024-01-01 10:00:00"), "converted")
      ),
      s"phase 2: buffered state lost or emissions duplicated: $emitted"
    )

    // ---- phase 3: restart again; an unrelated user far in the future
    // pushes the watermark past every horizon — the expiry timers armed
    // before/across the restarts must fire and drain the store
    writeBatch(srcDir, "b3", Seq(
      FunnelEvent(99L, 13L, "signup", ts("2024-02-01 00:00:00"))
    ))
    writeBatch(srcDir, "b4", Seq(
      FunnelEvent(99L, 14L, "view", ts("2024-02-01 00:00:01"))
    ))
    val events3 = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .json(s"$srcDir/*/")
      .as[FunnelEvent]
    val q3 = StreamingFunnel
      .transitions(events3, watermark = "1 hour")
      .writeStream
      .format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append")
      .start()
    try {
      q3.processAllAvailable()
      val stateRows = q3.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 1L,
        s"horizon-expired state must drain after restart, saw $stateRows rows")
    } finally q3.stop()
    assert(emitted.size == 4 && emitted.contains((99L, us("2024-02-01 00:00:00"), "signup")),
      s"phase 3 emissions wrong: $emitted")
  }
}
