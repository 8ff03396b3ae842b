package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingMinhashDedup

class StreamingMinhashDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streamed arrivals reproduce t41's matches regardless of batching") {
    // Arrivals (doc_id % 4 == 0) stream in TWO micro-batches against an
    // index pre-seeded from the served corpus (% 4 != 0). The
    // (doc_id, dup_of, jaccard) triples must equal one-shot t41
    // bit-for-bit; only the label may shift dup_batch -> dup_index when
    // the match landed in an earlier micro-batch (it IS in the index by
    // then — the documented cross-batch semantics).
    val docs = graft.sources.Tables
      .documents(spark, sf)
      .select("doc_id", "text")
    val indexDir = tmp("graft-smd-idx")
    // seed the served-corpus signatures as their own epoch
    StreamingMinhashDedup.appendEpoch(docs.filter($"doc_id" % 4 =!= 0), indexDir, -1L)

    val arrivals = docs.filter($"doc_id" % 4 === 0).as[(Long, String)].collect().toSeq
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, String, Option[Long], Option[Double])]()
    val q = StreamingMinhashDedup.run(
      stream.toDF().toDF("doc_id", "text"),
      indexDir,
      docs,
      tmp("graft-smd-ckpt"),
      (v, _) =>
        got ++= v.collect().map { r =>
          (r.getLong(0), r.getString(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)))
        }
    )
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val batch = graft.operators.TextOps
      .queries("t41_minhash_index_dedup")(spark, sf)
      .collect()
      .map { r =>
        (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))
      }
      .toSeq
    assert(batch.exists(_._2 != "unique"), "fixture produced no dups at all")
    val gotById = got.sortBy(_._1)
    val batchById = batch.sortBy(_._1)
    assert(gotById.map(x => (x._1, x._3, x._4)) == batchById.map(x => (x._1, x._3, x._4)),
      "matches diverged between streaming and one-shot t41")
    // labels agree except the documented cross-batch dup_batch->dup_index shift
    gotById.zip(batchById).foreach { case (g, b) =>
      assert(
        g._2 == b._2 || (g._2 == "dup_index" && b._2 == "dup_batch"),
        s"doc ${g._1}: streaming says ${g._2}, batch says ${b._2}"
      )
    }
  }

  test("a replayed batch that already appended its signatures does not self-match") {
    // The replay hole the self-pair guard closes: appendEpoch commits,
    // the checkpoint does NOT, and the micro-batch re-runs — every
    // replayed arrival now finds its own signatures in the index. The
    // verdicts must be identical to the first run (replay idempotence),
    // not dup_index-of-itself at jaccard 1.0.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine")
    ).toDF("doc_id", "text")
    val dir = tmp("graft-smd-selfmatch")
    StreamingMinhashDedup.appendEpoch(docs, dir, 0L) // commit before replay
    val verdicts = graft.operators.TextOps
      .minhashVerdicts(docs, StreamingMinhashDedup.readIndex(spark, dir), docs)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
      .sortBy(_._1)
    assert(verdicts == Seq((1L, "unique"), (2L, "unique")),
      s"replayed arrivals self-matched against their own signatures: $verdicts")
  }

  test("a replayed batch does not probe its own prior attempt's epoch (sibling pairs keep their labels)") {
    // The self-pair guard is not enough (round-10 review): a replayed
    // batch containing near-dup SIBLINGS A < B would find B's previously
    // appended signatures via the index and flip A from unique to
    // dup_index-of-B. run() therefore probes with excludeEpoch = the
    // batch id; this pins the verdict equality directly.
    val nearDup =
      "the quick brown fox jumps over the lazy dog while rain falls softly"
    val docs = Seq(
      (1L, nearDup),
      (2L, nearDup + " today")
    ).toDF("doc_id", "text")
    val dir = tmp("graft-smd-sibling")
    StreamingMinhashDedup.appendEpoch(docs, dir, 3L) // the prior attempt
    def verdicts(idx: org.apache.spark.sql.DataFrame) = graft.operators.TextOps
      .minhashVerdicts(docs, idx, docs)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
      .sortBy(_._1)
    val replayed = verdicts(StreamingMinhashDedup.readIndex(spark, dir, excludeEpoch = 3L))
    assert(replayed == Seq((1L, "unique"), (2L, "dup_batch")),
      s"replay must reproduce the first attempt's verdicts: $replayed")
    // and WITHOUT the exclusion the original demonstrably flips — the
    // failure mode the parameter exists to prevent
    val poisoned = verdicts(StreamingMinhashDedup.readIndex(spark, dir))
    assert(poisoned.exists { case (id, v) => id == 1L && v == "dup_index" },
      s"fixture no longer reproduces the unguarded flip: $poisoned")
  }

  test("arrivals absent from the corpus frame still verify (postings from the batch)") {
    // the verify side must carry the arrivals' own postings: a streamed
    // doc missing from `corpus` would lose its sizes/intersection rows
    // and silently report unique even when it IS a near-dup of an
    // indexed doc
    val indexed = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val dir = tmp("graft-smd-absent")
    // bootstrap epochs are NEGATIVE (readIndex's convention): the stream's
    // own batch ids start at 0, and batch 0's probe excludes epoch 0 as
    // its own potential prior-attempt append
    StreamingMinhashDedup.appendEpoch(indexed, dir, -1L)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = StreamingMinhashDedup.run(
      stream.toDF().toDF("doc_id", "text"),
      dir,
      indexed, // corpus frame does NOT contain the arrival
      tmp("graft-smd-absent-ckpt"),
      (v, _) => got ++= v.collect().map(r => (r.getLong(0), r.getString(1)))
    )
    try {
      stream.addData((99L, "the quick brown fox jumps over the lazy dog today"))
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSeq == Seq((99L, "dup_index")),
      s"arrival outside the corpus frame must still verify against the index: $got")
  }

  test("a replayed epoch replaces its own signatures instead of double-appending") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val dir = tmp("graft-smd-replay")
    StreamingMinhashDedup.appendEpoch(docs, dir, 7L)
    val once = spark.read.parquet(dir).count()
    StreamingMinhashDedup.appendEpoch(docs, dir, 7L) // checkpoint replay
    val twice = spark.read.parquet(dir).count()
    assert(once == twice, s"replay grew the index: $once -> $twice")
    assert(once == 2 * 4, "4 band rows per doc expected")
    // and a different epoch APPENDS rather than replacing
    StreamingMinhashDedup.appendEpoch(docs.withColumn("doc_id", col("doc_id") + 10), dir, 8L)
    assert(spark.read.parquet(dir).count() == 2 * once)
  }
}
