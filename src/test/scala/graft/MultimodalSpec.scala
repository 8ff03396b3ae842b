package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("payload bytes survive the binary column round-trip") {
    val docs = Seq((1L, "hello"), (2L, "wörld")).toDF("doc_id", "text")
    val out = Multimodal
      .withPayload(docs)
      .as[(Long, Array[Byte])]
      .collect()
      .toMap
    assert(new String(out(1L), "UTF-8") == "hello")
    assert(out(2L).length == 6) // ö is 2 bytes in UTF-8
  }

  test("batched decode emits one MediaMeta per payload with stub features") {
    val docs = (0 until 200).map(i => (i.toLong, "x" * (i + 1))).toDF("doc_id", "text")
    val metas = Multimodal.decode(Multimodal.withPayload(docs)).collect()
    assert(metas.length == 200)
    val m = metas.find(_.mediaId == 9L).get
    assert(m.nBytes == 10L)
    assert(m.width == 64 + 10 % 64)
    assert(m.height == 64 + ('x'.toInt % 64))
    assert(m.nFrames == 1 + 10 % 8)
    assert(m.format == "fake/even")
  }

  test("metadata-only aggregation never touches payload bytes (column pruning)") {
    val plan = Multimodal
      .metaQuery(spark, "/root/testdata/sf0.001")
      .queryExecution
      .executedPlan
      .toString
    // the scan feeding decode() must read doc_id + text only
    assert(!plan.contains("lang") && !plan.contains("source"))
  }
}
