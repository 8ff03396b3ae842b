package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingCoreset
import graft.streaming.StreamingCoreset.{BucketState, CoresetPoint}

/** The 20th streaming module: one-pass k-center coreset (doubling
  * algorithm) — parity-gated against its own batch fold, invariant-
  * certified exactly (every point within 4τ of its bucket's centers),
  * and quality-gated against the batch-exact v33 greedy radius. */
class StreamingCoresetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val K = 8
  private val Buckets = 4

  /** sf0.001 embeddings as ordered CoresetPoints (ts = epoch + vec_id
    * seconds, bucket = vec_id mod 4) — the shared input of all gates. */
  private lazy val points: Vector[CoresetPoint] = {
    val rows = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])]
      .collect()
      .sortBy(_._1)
    rows.iterator.map { case (id, e) =>
      CoresetPoint((id % Buckets).toInt, id, e, new Timestamp(id * 1000L))
    }.toVector
  }

  private lazy val batchStates: Map[Int, BucketState] =
    StreamingCoreset.coresetBatch(points, K)

  test("streaming snapshots across 3 micro-batches match the batch fold exactly") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[CoresetPoint]
    val q = StreamingCoreset
      .coresetSnapshots(stream.toDS(), K)
      .writeStream
      .format("memory")
      .queryName("coreset_test")
      .outputMode("update")
      .start()
    try {
      // vec_id-ordered chunks => the concatenation is the batch order,
      // but state must round-trip the store between micro-batches
      points.grouped(points.size / 3 + 1).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
      val last = spark
        .table("coreset_test")
        .as[(Int, Long, Int, Double, Seq[Long])]
        .collect()
        .groupBy(_._1)
        .map { case (b, snaps) => b -> snaps.maxBy(_._2) }
      assert(last.keySet == batchStates.keySet)
      batchStates.foreach { case (b, st) =>
        val (_, nSeen, nCenters, tau, ids) = last(b)
        assert(nSeen == st.nSeen, s"bucket $b n_seen")
        assert(nCenters == st.centerIds.size, s"bucket $b n_centers")
        assert(tau == st.tau, s"bucket $b tau: stream $tau vs batch ${st.tau}")
        assert(ids == st.centerIds, s"bucket $b center ids")
      }
    } finally q.stop()
  }

  test("coreset resumes from checkpoint: doubling state survives a restart bit-identically") {
    // StreamingRecoverySpec's wiring (file source + checkpointed
    // foreachBatch sink — MemoryStream cannot restart) pointed at the
    // module whose state IS the product: after a kill between
    // micro-batches, the resumed stream's final snapshot must equal the
    // batch fold of the full sequence — centers, τ, and n_seen exactly.
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-coreset-rec").toString
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()
    val schema = StructType(Seq(
      StructField("bucket", IntegerType),
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("ts", TimestampType)
    ))
    def writeChunk(name: String, rows: Seq[CoresetPoint]): Unit =
      rows.toDF().coalesce(1).write.json(s"$srcDir/$name")
    def run(): Unit = {
      val pts = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(s"$srcDir/*/")
        .as[CoresetPoint]
      val q = StreamingCoreset
        .coresetSnapshots(pts, K)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$root/chk")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingCoreset.CoresetSnapshot], _: Long) =>
          b.write.mode("append").parquet(s"$root/out")
        }
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    val (chunk1, chunk2) = points.splitAt(2 * points.size / 3)
    writeChunk("b1", chunk1)
    run() // phase 1, then "kill": offsets + state live in the checkpoint
    writeChunk("b2", chunk2)
    run() // phase 2: resumed from checkpoint
    val fin = spark.read
      .parquet(s"$root/out")
      .as[(Int, Long, Int, Double, Seq[Long])]
      .collect()
      .groupBy(_._1)
      .map { case (b, snaps) => b -> snaps.maxBy(_._2) }
    batchStates.foreach { case (b, st) =>
      val (_, nSeen, _, tau, ids) = fin(b)
      assert(nSeen == st.nSeen, s"bucket $b n_seen after recovery")
      assert(tau == st.tau, s"bucket $b tau after recovery: $tau vs ${st.tau}")
      assert(ids == st.centerIds, s"bucket $b centers after recovery")
    }
  }

  test("invariants hold exactly: ≤ k centers, pairwise > 2τ, every point within 4τ") {
    batchStates.foreach { case (b, st) =>
      assert(st.centerIds.size <= K, s"bucket $b has ${st.centerIds.size} centers")
      if (st.tau > 0.0)
        for {
          i <- st.centers.indices
          j <- (i + 1) until st.centers.size
        } assert(
          StreamingCoreset.dist(st.centers(i), st.centers(j)) > 2 * st.tau,
          s"bucket $b centers $i,$j violate pairwise > 2τ"
        )
    }
    points.foreach { p =>
      val st = batchStates(p.bucket)
      val d = st.centers.iterator.map(StreamingCoreset.dist(p.embedding, _)).min
      val bound = if (st.tau == 0.0) 0.0 else 4 * st.tau
      assert(d <= bound, s"vec ${p.vec_id}: dist $d > 4τ=$bound in bucket ${p.bucket}")
    }
  }

  test("merged k-center radius obeys the composition bound and stays near the exact greedy radius") {
    val (chosen, rMerge) = StreamingCoreset.mergedCenters(batchStates.values, K)
    assert(chosen.size == K)
    val measured = points.iterator
      .map(p => chosen.iterator.map(c => StreamingCoreset.dist(p.embedding, c._2)).min)
      .max
    val tauMax = batchStates.values.map(_.tau).max
    // provable: point -> its bucket center (≤ 4τ_b) -> nearest merged center (≤ r_merge)
    assert(
      measured <= 4 * tauMax + rMerge + 1e-9,
      s"measured $measured > composition bound ${4 * tauMax + rMerge}"
    )
    // quality vs the exact greedy 2-approximation (v33's certified radius):
    // theory caps the one-pass composition well above this; measured ratio
    // on this geometry is ~1–2× and 4× is the pinned regression envelope.
    val greedy = SparkEntry
      .queries("v33_kcenter_radius")(spark, dir)
      .agg(org.apache.spark.sql.functions.max("radius2"))
      .as[Double]
      .head
    val rGreedy = math.sqrt(greedy)
    assert(
      measured <= 4 * rGreedy,
      s"one-pass radius $measured vs exact greedy $rGreedy: ratio ${measured / rGreedy}"
    )
    info(f"one-pass/greedy radius ratio = ${measured / rGreedy}%.3f (r_merge=$rMerge%.3f, τ_max=$tauMax%.3f)")
  }
}
