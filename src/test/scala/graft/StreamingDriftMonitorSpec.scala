package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDriftMonitor

class StreamingDriftMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("batch-mode drift against the prior snapshot equals t56_snapshot_drift row-for-row") {
    // the parity gate: fit the reference on t56's PRIOR snapshot
    // (doc_id % 13 <> 0), grade t56's CURRENT snapshot (doc_id % 7 <> 0)
    // as one batch — the monitor must reproduce the oracle-checked t56
    // rows exactly (same binning, same integer TV)
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, sf)
    val ref = StreamingDriftMonitor.fitReference(docs.filter($"doc_id" % 13 =!= 0))
    val monitored = StreamingDriftMonitor
      .driftBatch(docs.filter($"doc_id" % 7 =!= 0), ref)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val batch = graft.operators.TextOps
      .queries("t56_snapshot_drift")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(batch.nonEmpty, "fixture produced no drift rows")
    assert(monitored == batch,
      s"monitor/batch drift diverged:\n$monitored\nvs\n$batch")
  }

  test("a same-distribution batch reads ~0 drift; a shifted batch reads large drift") {
    // reference: short low-quality docs and long high-quality docs, 50/50
    val low = (1L to 20L).map(i => (i, "the the the", "en"))
    val high = (21L to 40L).map(i => (i, Seq.fill(120)("word").mkString(" "), "en"))
    val ref = StreamingDriftMonitor.fitReference(
      (low ++ high).toDF("doc_id", "text", "lang")
    )

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    val got = scala.collection.mutable.Map[Long, Seq[(String, Long)]]()
    val q = StreamingDriftMonitor.run(
      stream.toDF().toDF("doc_id", "text", "lang"),
      ref,
      (rows, id) =>
        got(id) = rows.collect().map(r => (r.getString(0), r.getLong(4))).toSeq
    )
    try {
      // batch 0: the same 50/50 mix — distributionally identical
      stream.addData((101L, "the the the", "en"), (102L, Seq.fill(120)("word").mkString(" "), "en"))
      q.processAllAvailable()
      // batch 1: all boilerplate — the drift the monitor exists to catch
      stream.addData((201L to 204L).map(i => (i, "the the the", "en")): _*)
      q.processAllAvailable()
      // batch 2: an entirely NEW language — a complete distribution
      // replacement must read TOTAL drift (1e6), not the degenerate 0
      // the raw cross-multiplied formula produces when one side is empty
      stream.addData((301L to 303L).map(i => (i, "le le le", "fr")): _*)
      q.processAllAvailable()
      val tv0 = got(0L).head._2
      val tv1 = got(1L).head._2
      assert(tv0 == 0L, s"same-mix batch must read zero drift, got $tv0")
      assert(tv1 >= 400000L, s"boilerplate batch must read large drift, got $tv1")
      val byLang = got(2L).toMap
      assert(byLang("fr") == 1000000L, s"unseen language must read total drift: $byLang")
      assert(byLang("en") == 1000000L, s"vanished language must read total drift: $byLang")
    } finally q.stop()
  }
}
