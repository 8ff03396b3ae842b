package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingSuffixProbe

class StreamingSuffixProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed micro-batches reproduce t72's per-arrival verdicts exactly") {
    // the parity gate: t72's arrivals (doc_id % 4 == 0) stream in as TWO
    // micro-batches against the index fitted on the SAME base split; the
    // union of per-batch verdicts must equal the oracle-checked batch
    // t72 output row-for-row — same persisted gram index, same probe
    // plan (suffixProbeVerdicts is shared verbatim, so a fork is
    // structurally impossible; this gate catches the wiring instead)
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables
      .documents(spark, sf)
      .select("doc_id", "text")
    val words = docs.select(
      $"doc_id",
      graft.functions.F.wsTokens($"text").as("w")
    )
    val idx = StreamingSuffixProbe.fitIndex(
      spark,
      words.filter($"doc_id" % 4 =!= 0),
      graft.operators.TextOps.documentsSnapshot(sf) + "|base_mod4",
      L = 16
    )
    val arrivals = docs
      .filter($"doc_id" % 4 === 0)
      .as[(Long, String)]
      .collect()
      .toSeq
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    type Verdict = (Long, Long, Long, Long, Option[Long])
    val got = scala.collection.mutable.ArrayBuffer[Verdict]()
    val q = StreamingSuffixProbe.run(
      stream.toDF().toDF("doc_id", "text"),
      idx,
      (rows, _) =>
        got ++= rows
          .collect()
          .map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
             if (r.isNullAt(4)) None else Some(r.getLong(4))))
    )
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()

      val batch = graft.operators.TextOps
        .queries("t72_incremental_suffix_probe")(spark, sf)
        .collect()
        .map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
           if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toSeq
      assert(batch.nonEmpty, "fixture produced no arrivals")
      assert(batch.exists(_._4 > 0L), "fixture arrivals hit nothing — gate is vacuous")
      assert(
        got.sortBy(_._1).toSeq == batch.sortBy(_._1),
        s"streaming/batch suffix probe diverged: got=${got.size} batch=${batch.size}"
      )
    } finally q.stop()
  }
}
