package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingEmbedDecontaminate

class StreamingEmbedDecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed micro-batches reproduce t75's contamination rows exactly") {
    // the parity gate: t75's training side streams in as TWO
    // micro-batches against the eval index fitted on the same eval
    // slice under the same solved geometry (corpusN = the full corpus
    // count t75 solves from); the union of per-batch verdicts must
    // equal the oracle-checked batch t75 rows exactly —
    // embedScreenVerdicts is shared verbatim, so this gate catches the
    // fit/wiring, not a forked criterion
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables
      .documents(spark, sf)
      .select("doc_id", "text")
    val corpusN = graft.multimodal.MultimodalOps
      .gramEmbedFrame(
        docs.filter(org.apache.spark.sql.functions.length($"text") > 0),
        $"doc_id",
        $"text")
      .count()
    val idx = StreamingEmbedDecontaminate.fitEval(
      spark,
      docs.filter($"doc_id" % 10 === 0),
      corpusN
    )
    val arrivals = docs
      .filter($"doc_id" % 10 =!= 0)
      .as[(Long, String)]
      .collect()
      .toSeq
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    type Verdict = (Long, Long, Long, Double)
    val got = scala.collection.mutable.ArrayBuffer[Verdict]()
    val q = StreamingEmbedDecontaminate.run(
      stream.toDF().toDF("doc_id", "text"),
      idx,
      (rows, _) =>
        got ++= rows
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    )
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()

      val batch = graft.operators.TextOps
        .queries("t75_embed_decontaminate")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      assert(batch.nonEmpty, "fixture produced no contamination — gate is vacuous")
      assert(
        got.sortBy(_._1).toSeq == batch.sortBy(_._1),
        s"streaming/batch embed screen diverged: got=${got.sortBy(_._1)} batch=${batch.sortBy(_._1)}"
      )
    } finally {
      q.stop()
      StreamingEmbedDecontaminate.release(idx)
    }
  }
}
