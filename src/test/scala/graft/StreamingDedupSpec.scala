package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming dedup admits each content fingerprint once within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup
      .dedup(stream.toDF().toDF("doc_id", "ts", "text"), watermark = "10 minutes")
      .writeStream
      .format("memory")
      .queryName("dedup_test")
      .outputMode("append")
      .start()
    try {
      stream.addData(
        (1L, ts("2024-01-01 10:00:00"), "alpha"),
        (2L, ts("2024-01-01 10:01:00"), "alpha"), // dup content, same batch
        (3L, ts("2024-01-01 10:02:00"), "beta")
      )
      q.processAllAvailable()
      // dup in a later batch, still within the watermark horizon
      stream.addData((4L, ts("2024-01-01 10:03:00"), "alpha"))
      q.processAllAvailable()
      val out = spark.table("dedup_test").select("doc_id").as[Long].collect().sorted
      assert(out.toSeq == Seq(1L, 3L)) // one row per distinct content
      // distinct content after the horizon is admitted normally
      stream.addData((5L, ts("2024-01-01 12:00:00"), "gamma"))
      q.processAllAvailable()
      val out2 = spark.table("dedup_test").select("doc_id").as[Long].collect().sorted
      assert(out2.toSeq == Seq(1L, 3L, 5L))
    } finally q.stop()
  }

  test("state is evicted past the watermark: a late re-arrival is admitted again") {
    // The documented trade of dropDuplicatesWithinWatermark: state is
    // bounded by the watermark horizon (fingerprints are EVICTED once the
    // watermark passes their TTL), at the cost that a duplicate arriving
    // later than the delay is admitted as new. This pins both halves —
    // the re-admission AND the state-size drop the eviction buys.
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup
      .dedup(stream.toDF().toDF("doc_id", "ts", "text"), watermark = "10 minutes")
      .writeStream
      .format("memory")
      .queryName("dedup_evict_test")
      .outputMode("append")
      .start()
    try {
      stream.addData(
        (1L, ts("2024-01-01 10:00:00"), "alpha"),
        (2L, ts("2024-01-01 10:01:00"), "beta"),
        (3L, ts("2024-01-01 10:02:00"), "gamma")
      )
      q.processAllAvailable()
      // advance event time 2h: watermark 11:50 passes every 10:0x TTL
      stream.addData((4L, ts("2024-01-01 12:00:00"), "omega"))
      q.processAllAvailable()
      // same content as doc 1, after its state was evicted -> admitted AGAIN
      stream.addData((5L, ts("2024-01-01 12:01:00"), "alpha"))
      q.processAllAvailable()
      val out = spark.table("dedup_evict_test").select("doc_id").as[Long].collect().sorted
      assert(out.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      // state held 5 fingerprints over the stream's life but carries only
      // the unexpired ones now — bounded by horizon x rate, not history
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 2, s"expected evicted state, found $stateRows rows")
    } finally q.stop()
  }

  test("batch parity: the same fingerprint key drives the batch t3 operator") {
    // the streaming op's dedup key equals t3's fingerprint column
    val batch = graft.operators.TextOps
      .queries("t3_dedup_exact")(spark, "/root/testdata/sf0.001")
      .select("doc_id", "fingerprint")
      .collect()
    assert(batch.nonEmpty)
    assert(batch.forall(_.getString(1).length == 32)) // md5 hex
  }
}
