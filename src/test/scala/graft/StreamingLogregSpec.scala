package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorOps
import graft.streaming.StreamingLogreg

/** Gates for the streaming mini-batch SGD trainer: bit-exact parity
  * with folding the same slices in batch mode (the distributed integer
  * gradient ledger makes arrival ORDER within a batch irrelevant — the
  * property the stream leans on), the single-batch bridge to v35's
  * oracle-checked iteration-1 row, and ledger-backed restart resume +
  * replay idempotence.
  */
class StreamingLogregSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private val schema = StructType(
    Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)
    )
  )

  private def slices(): Seq[org.apache.spark.sql.DataFrame] = {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    Seq(
      emb.filter(col("vec_id") < 150),
      emb.filter(col("vec_id") >= 150 && col("vec_id") < 300),
      emb.filter(col("vec_id") >= 300)
    )
  }

  test("streamed micro-batches reproduce the batch fold bit for bit") {
    val root = java.nio.file.Files.createTempDirectory("graft-slogreg").toString
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()
    slices().zipWithIndex.foreach { case (df, i) =>
      df.coalesce(1).write.parquet(s"$srcDir/b$i")
      // one file per listing tick -> one micro-batch per slice, in order
      Thread.sleep(5)
    }
    val trainer = new StreamingLogreg.Trainer(spark, s"$root/ledger")
    val q = StreamingLogreg.start(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/*/"),
      trainer,
      s"$root/chk"
    )
    try q.processAllAvailable()
    finally q.stop()

    val (wRef, steps) = StreamingLogreg.trainSlices(slices())
    assert(trainer.highWater == 2L) // batches 0, 1, 2 applied
    assert(trainer.weights.toSeq == wRef.toSeq) // bit-exact doubles
    val ledger = spark.read
      .parquet(s"$root/ledger")
      .orderBy("batch_id")
      .collect()
      .map(r => (r.getAs[Long]("n"),
        r.getSeq[Long](r.fieldIndex("g_sums")).toSeq,
        r.getSeq[Double](r.fieldIndex("w_after")).toSeq))
      .toSeq
    assert(ledger == steps)
  }

  test("the whole corpus as ONE batch is exactly v35's first GD iteration") {
    val root = java.nio.file.Files.createTempDirectory("graft-slogreg1").toString
    val trainer = new StreamingLogreg.Trainer(spark, s"$root/ledger")
    trainer.handleBatch(graft.sources.Tables.embeddings(spark, sf), 0L)
    val row0 = spark.read.parquet(s"$root/ledger").collect()(0)
    val gStream = row0.getSeq[Long](row0.fieldIndex("g_sums")).toSeq
    val v35iter1 = VectorOps
      .queries("v35_logreg_fit")(spark, sf)
      .filter(col("iter") === 1)
      .orderBy("j")
      .collect()
      .map(_.getAs[Long]("g_sum"))
      .toSeq
    assert(gStream == v35iter1)
  }

  test("restart resumes from the persisted ledger; replays are no-ops") {
    val root = java.nio.file.Files.createTempDirectory("graft-slogreg2").toString
    val s = slices()
    val t1 = new StreamingLogreg.Trainer(spark, s"$root/ledger")
    t1.handleBatch(s(0), 0L)
    t1.handleBatch(s(1), 1L)
    val wAfter = t1.weights.toSeq

    // "restart": a fresh trainer over the same ledger dir
    val t2 = new StreamingLogreg.Trainer(spark, s"$root/ledger")
    assert(t2.weights.toSeq == wAfter)
    assert(t2.highWater == 1L)

    // checkpoint re-delivery of batch 1: nothing moves
    t2.handleBatch(s(1), 1L)
    assert(t2.weights.toSeq == wAfter)
    assert(spark.read.parquet(s"$root/ledger").count() == 2)

    // OUT-OF-ORDER replay of an older id (0 after 1 is applied): the
    // high-water mark must treat ANY id at or below it as a replay —
    // the O(1) state that replaced the O(batches) applied-id set
    t2.handleBatch(s(0), 0L)
    assert(t2.weights.toSeq == wAfter)
    assert(t2.highWater == 1L)
    assert(spark.read.parquet(s"$root/ledger").count() == 2)

    // the next real batch continues the fold exactly where t1 stopped
    t2.handleBatch(s(2), 2L)
    val (wRef, _) = StreamingLogreg.trainSlices(s)
    assert(t2.weights.toSeq == wRef.toSeq)
    assert(t2.highWater == 2L)
  }
}
