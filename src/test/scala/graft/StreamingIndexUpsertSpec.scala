package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IvfAnn, VectorIndexStore}
import graft.sources.Tables
import graft.streaming.StreamingIndexUpsert

final case class ArrivalVec(vec_id: Long, embedding: Seq[Float])

/** Continuous index maintenance: streamed arrival batches must land in
  * the epoch-partitioned delta, replay their own partitions idempotently,
  * and serve through the base∪delta probe EXACTLY like the batch upsert
  * path serves the same arrivals — streaming and batch maintenance are
  * the same index.
  */
class StreamingIndexUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streamed arrivals are delta-idempotent and serve like the batch upsert") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf)
    val existing = emb.filter(col("vec_id") % 10 =!= 0)
    val arrivals = emb
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"))
      .as[ArrivalVec]
      .collect()
    val (first, second) = arrivals.splitAt(arrivals.length / 2)

    VectorIndexStore.write(existing, "ivf_stream_t")   // streaming target
    VectorIndexStore.write(existing, "ivf_batch_t")    // batch-path control
    val deltaDir = Files.createTempDirectory("ivf_delta").toString
    val ckpt = Files.createTempDirectory("ivf_ckpt").toString
    try {
      val stream = MemoryStream[ArrivalVec]
      val q = StreamingIndexUpsert.start(stream.toDS().toDF(), "ivf_stream_t", deltaDir, ckpt)
      try {
        stream.addData(first.toSeq)
        q.processAllAvailable()
        stream.addData(second.toSeq)
        q.processAllAvailable()
      } finally q.stop()

      // every arrival landed exactly once, under two epochs
      val delta = spark.read.parquet(deltaDir)
      assert(delta.count() == arrivals.length)
      assert(delta.select("epoch").distinct().count() == 2)

      // replaying epoch 0 (checkpoint-replay case) overwrites its own
      // partitions — never duplicates
      VectorIndexStore.writeDelta(
        spark.createDataFrame(first.toSeq).toDF("vec_id", "embedding"),
        "ivf_stream_t",
        deltaDir,
        epoch = 0L
      )
      assert(spark.read.parquet(deltaDir).count() == arrivals.length)

      // the maintained index IS the batch-upserted index: identical probe
      // output over base∪delta vs the appended table
      VectorIndexStore.upsert(
        spark,
        "ivf_batch_t",
        emb.filter(col("vec_id") % 10 === 0)
      )
      val queries = emb.filter(col("vec_id") < 10)
      val streamed =
        VectorIndexStore.probeWithDelta(spark, "ivf_stream_t", deltaDir, queries).collect().toSeq
      val batched =
        VectorIndexStore.probe(spark, "ivf_batch_t", queries).collect().toSeq
      assert(streamed == batched)
      assert(streamed.length == 50)
      // base+delta per-list totals equal v20's oracle-checked ledger
      val served = spark
        .table("ivf_stream_t")
        .groupBy("cid")
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => r.getInt(0).toLong -> r.getLong(1))
        .toMap
      // fresh read: the epoch-0 replay above replaced the files the
      // pre-replay `delta` frame had resolved
      val deltaCounts = spark.read
        .parquet(deltaDir)
        .groupBy("cid")
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => r.getInt(0).toLong -> r.getLong(1))
        .toMap
      val combined =
        (served.keySet ++ deltaCounts.keySet).map { c =>
          c -> (served.getOrElse(c, 0L) + deltaCounts.getOrElse(c, 0L))
        }.toMap
      val ledger = IvfAnn
        .upsert(spark, sf)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(3))
        .toMap
      assert(combined == ledger)

      // compaction folds the delta into the base without changing a
      // single probe answer, and clears the folded epochs (ONLY those —
      // a concurrent writer's new epoch must survive, so the root stays)
      VectorIndexStore.compact(spark, "ivf_stream_t", deltaDir)
      val leftover = Option(new java.io.File(deltaDir).listFiles()).toSeq.flatten
      assert(!leftover.exists(_.getName.startsWith("epoch=")), s"epochs survived: ${leftover.toList}")
      val compacted =
        VectorIndexStore.probe(spark, "ivf_stream_t", queries).collect().toSeq
      assert(compacted == batched)
      // the empty-delta state is a normal lifecycle point: the base∪delta
      // probe must keep serving (base-only fallback), identically
      val postCompact =
        VectorIndexStore.probeWithDelta(spark, "ivf_stream_t", deltaDir, queries).collect().toSeq
      assert(postCompact == batched)
      val baseCounts = spark
        .table("ivf_stream_t")
        .groupBy("cid")
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => r.getInt(0).toLong -> r.getLong(1))
        .toMap
      assert(baseCounts == ledger)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_stream_t")
      spark.sql("DROP TABLE IF EXISTS ivf_stream_t_centroids")
      spark.sql("DROP TABLE IF EXISTS ivf_batch_t")
      spark.sql("DROP TABLE IF EXISTS ivf_batch_t_centroids")
    }
  }
}
