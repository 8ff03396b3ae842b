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

  test("SCD tombstone ordinal survives a checkpoint kill-and-restart") {
    // e2e for the round-10 tombstone fix: a quiet-timeout tombstone
    // (n == 0, carrying the last emitted ordinal) written to the state
    // store BEFORE the kill must seat the user's post-restart segment at
    // ordinal + 1 — a lost tombstone restarts seg_id at 1 and seats two
    // different rows under one (user_id, seg_id) key.
    import graft.streaming.StreamingScdIntervals
    import graft.streaming.StreamingScdIntervals.ScdEvent
    val root = java.nio.file.Files.createTempDirectory("graft-scd-recovery").toString
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()
    val scdSchema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("ts", TimestampType)
    ))
    def writeScd(name: String, rows: Seq[ScdEvent]): Unit =
      rows.toDF().coalesce(1).write.json(s"$srcDir/$name")
    def run(): Unit = {
      val events = spark.readStream
        .schema(scdSchema)
        .option("maxFilesPerTrigger", "1")
        .json(s"$srcDir/*/")
        .as[ScdEvent]
      val q = StreamingScdIntervals
        .scdIntervals(events, watermark = "10 minutes", quietUs = 30L * 60 * 1000000)
        .writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/chk")
        .outputMode("append")
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    def emitted: Seq[(Long, Long, String, Long, Option[Long], Long)] = spark.read
      .parquet(s"$root/out")
      .as[(Long, Long, String, Long, Option[Long], Long)]
      .collect()
      .toSeq
      .sortBy(r => (r._1, r._2))

    // phase 1: u1 opens 'free' (seg 1), upgrades to 'paid' (closes seg 1,
    // opens seg 2); u2's late events push the watermark past the quiet
    // horizon so the timeout emits seg 2 as CURRENT and leaves the
    // tombstone in the checkpointed store; then the query stops
    writeScd("b1", Seq(
      ScdEvent(1L, 100L, "free", ts("2024-01-01 10:00:00")),
      ScdEvent(1L, 101L, "free", ts("2024-01-01 10:05:00"))
    ))
    writeScd("b2", Seq(ScdEvent(1L, 102L, "paid", ts("2024-01-01 10:20:00"))))
    writeScd("b3", Seq(ScdEvent(2L, 200L, "free", ts("2024-01-01 11:30:00"))))
    writeScd("b4", Seq(ScdEvent(2L, 201L, "free", ts("2024-01-01 11:31:00"))))
    run()
    assert(
      emitted == Seq(
        (1L, 1L, "free", us("2024-01-01 10:00:00"), Some(us("2024-01-01 10:20:00")), 2L),
        (1L, 2L, "paid", us("2024-01-01 10:20:00"), None, 1L)
      ),
      s"phase 1 must close seg 1 and timeout-emit seg 2: $emitted"
    )

    // phase 2: restart from the checkpoint — u1's next events must open
    // ordinal 3 (the tombstone's +1), observable once a type change
    // closes it
    writeScd("b5", Seq(ScdEvent(1L, 103L, "paid", ts("2024-01-01 11:32:00"))))
    writeScd("b6", Seq(ScdEvent(1L, 104L, "free", ts("2024-01-01 11:40:00"))))
    run()
    val reopened = emitted.filter(r => r._1 == 1L && r._5.isDefined && r._3 == "paid")
    assert(
      reopened == Seq(
        (1L, 3L, "paid", us("2024-01-01 11:32:00"), Some(us("2024-01-01 11:40:00")), 1L)
      ),
      s"post-restart segment must continue at ordinal 3: $emitted"
    )
    val seatings = emitted.groupBy(r => (r._1, r._2)).filter(_._2.map(_._4).distinct.size > 1)
    assert(seatings.isEmpty, s"two rows seated under one (user, seg) key: $seatings")
  }

  test("minhash dedup replays a killed batch with bit-identical verdicts (epoch exclusion e2e)") {
    // The real crash window the MemoryStream specs simulate by hand:
    // foreachBatch ran (verdicts consumed, appendEpoch committed its
    // signatures) but the checkpoint commit never landed. Deleting the
    // commit marker and restarting makes Structured Streaming re-run the
    // SAME batch id over the SAME offsets — the replayed attempt must
    // produce the first attempt's verdicts verbatim (excludeEpoch keeps
    // the prior attempt's signatures out of the probe; intra-batch
    // near-dup siblings are the poisoned case) and the index must hold
    // ONE copy of the epoch's signatures (dynamic partition overwrite).
    import graft.streaming.StreamingMinhashDedup
    val root = java.nio.file.Files.createTempDirectory("graft-smd-recovery").toString
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)
    ))
    val nearDup =
      "the quick brown fox jumps over the lazy dog while rain falls softly"
    Seq((1L, nearDup), (2L, nearDup + " today"))
      .toDF("doc_id", "text")
      .coalesce(1)
      .write.json(s"$srcDir/b1")
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val attempts = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(): Unit = {
      val docs = spark.readStream
        .schema(docSchema)
        .option("maxFilesPerTrigger", "1")
        .json(s"$srcDir/*/")
      val q = StreamingMinhashDedup.run(
        docs,
        s"$root/index",
        corpus,
        s"$root/chk",
        (verdicts, id) => {
          val att = counter.getAndIncrement()
          attempts += ((id, att))
          verdicts.write.parquet(s"$root/verdicts/e${id}_a$att")
        }
      )
      try q.processAllAvailable()
      finally q.stop()
    }
    run()
    assert(attempts.toSeq == Seq((0L, 0)), s"phase 1 attempts: $attempts")

    // crash simulation: offsets/0 exists, commits/0 vanishes — the
    // failure point between the epoch's side effects and its commit
    val commit0 = new java.io.File(s"$root/chk/commits/0")
    assert(commit0.isFile, "fixture drift: expected chk/commits/0")
    assert(commit0.delete())
    // the local ChecksumFs shadows every log file with a .crc twin; a
    // stale twin makes the replay's commit rename fail
    new java.io.File(s"$root/chk/commits/.0.crc").delete()
    run()
    assert(attempts.toSeq == Seq((0L, 0), (0L, 1)),
      s"restart must replay batch 0 exactly once: $attempts")
    def verdictSet(path: String): Set[String] =
      spark.read.parquet(path).collect().map(_.toString).toSet
    val first = verdictSet(s"$root/verdicts/e0_a0")
    val replay = verdictSet(s"$root/verdicts/e0_a1")
    assert(first.nonEmpty && first.exists(_.contains("dup_batch")),
      s"fixture must contain an intra-batch near-dup pair: $first")
    assert(replay == first,
      s"replayed verdicts diverged:\nfirst=$first\nreplay=$replay")
    // the epoch partition column reads back int-inferred from "epoch=0"
    val epochRows = spark.read.parquet(s"$root/index")
      .groupBy("epoch").count().collect()
      .map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    val expectedBands = graft.operators.TextOps
      .minhashBands(Seq((1L, nearDup), (2L, nearDup + " today")).toDF("doc_id", "text"))
      .count()
    assert(epochRows == Map(0L -> expectedBands),
      s"index must hold exactly ONE copy of epoch 0's $expectedBands bands: $epochRows")
  }
}
