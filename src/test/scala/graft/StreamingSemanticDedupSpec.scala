package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MultimodalOps
import graft.streaming.StreamingSemanticDedup

class StreamingSemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def corpus = spark.read
    .parquet(s"$sf/documents.parquet")
    .select(col("doc_id").as("vec_id"), col("text").as("content"))

  private def geometry: (Int, Int) = {
    graft.functions.GraftFunctions.register(spark)
    val n = StreamingSemanticDedup.featurize(corpus).count()
    graft.operators.VectorOps.bandGeometry(n, tau = 0.85, targetCandPerVec = 256, maxMiss = 1e-6)
  }

  test("streamed media reproduce the one-shot semantic verdicts regardless of batching") {
    // The whole sf0.001 media corpus streams in THREE id-ordered
    // micro-batches against an initially empty index. The (vec_id,
    // dup_of, cos) triples must equal the one-shot run (everything in one
    // batch) bit-for-bit; only the label may shift dup_batch → dup_index
    // when the match landed in an earlier micro-batch — the documented
    // cross-batch semantics, same as StreamingMinhashDedup. Arrivals are
    // id-ordered so "earlier batch" == "smaller id", which is exactly the
    // one-shot engine's candBatch ordering — the condition under which
    // the triple is batching-invariant.
    val (nBands, bandBits) = geometry
    val rows = corpus.as[(Long, String)].collect().sortBy(_._1).toSeq
    val third = (rows.length + 2) / 3
    val batches = rows.grouped(third).toSeq

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, String, Option[Long], Option[Double])]()
    val q = StreamingSemanticDedup.run(
      stream.toDF().toDF("vec_id", "content"),
      tmp("graft-ssd-idx"),
      tmp("graft-ssd-ckpt"),
      nBands,
      bandBits,
      0.8,
      (v, _) =>
        got ++= v.collect().map { r =>
          (r.getLong(0), r.getString(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)))
        }
    )
    try {
      batches.foreach { b =>
        stream.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val all = corpus
    val vecs = StreamingSemanticDedup.featurize(all).persist()
    val oneShot =
      try {
        MultimodalOps
          .semanticVerdicts(
            all.select("vec_id"),
            vecs,
            StreamingSemanticDedup.readBands(spark, tmp("graft-ssd-empty") + "/idx"),
            StreamingSemanticDedup.readVecs(spark, tmp("graft-ssd-empty2") + "/idx"),
            nBands,
            bandBits,
            0.8
          )
          .collect()
          .map { r =>
            (r.getLong(0), r.getString(1),
              if (r.isNullAt(2)) None else Some(r.getLong(2)),
              if (r.isNullAt(3)) None else Some(r.getDouble(3)))
          }
          .toSeq
      } finally vecs.unpersist()

    assert(oneShot.exists(_._2 != "unique"), "fixture produced no dups at all")
    val gotById = got.sortBy(_._1)
    val oneById = oneShot.sortBy(_._1)
    assert(gotById.map(x => (x._1, x._3, x._4)) == oneById.map(x => (x._1, x._3, x._4)),
      "matches diverged between streaming and one-shot semantic dedup")
    gotById.zip(oneById).foreach { case (g, b) =>
      assert(
        g._2 == b._2 || (g._2 == "dup_index" && b._2 == "dup_batch"),
        s"media ${g._1}: streaming says ${g._2}, one-shot says ${b._2}"
      )
    }

    // cross-gate against the DECLARED batch query: every streamed dup
    // verdict is an m7b pair (direction-normalized) with the identical
    // rounded cosine — the stream screens with exactly m7b's criterion
    val m7bPairs = MultimodalOps
      .queries("m7b_semantic_dedup_banded")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    got.filter(_._2 != "unique").foreach { t =>
      val (v, d, c) = (t._1, t._3.get, t._4.get)
      val key = (math.min(v, d), math.max(v, d))
      assert(m7bPairs.get(key).contains(c),
        s"streamed dup ($v, $d, $c) is not an m7b pair")
    }
  }

  test("a replayed batch that already appended its signatures does not self-match") {
    // appendEpoch commits, the checkpoint does not, the micro-batch
    // re-runs: every replayed arrival finds its own band rows and vector
    // in the index. Verdicts must equal the first run's, not
    // dup_index-of-itself at cos 1.0.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine")
    ).toDF("vec_id", "content")
    val dir = tmp("graft-ssd-selfmatch")
    val vecs = StreamingSemanticDedup.featurize(docs)
    StreamingSemanticDedup.appendEpoch(vecs, dir, 0L, 16, 8) // commit before replay
    val verdicts = MultimodalOps
      .semanticVerdicts(
        docs.select("vec_id"),
        vecs,
        StreamingSemanticDedup.readBands(spark, dir),
        StreamingSemanticDedup.readVecs(spark, dir),
        16,
        8,
        0.8
      )
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
      .sortBy(_._1)
    assert(verdicts == Seq((1L, "unique"), (2L, "unique")),
      s"replayed arrivals self-matched against their own signatures: $verdicts")
  }

  test("an arrival with no word trigram still reports unique (spine, not embeddings)") {
    val docs = Seq((7L, "two words")).toDF("vec_id", "content")
    val v = MultimodalOps
      .semanticVerdicts(
        docs.select("vec_id"),
        StreamingSemanticDedup.featurize(docs),
        StreamingSemanticDedup.readBands(spark, tmp("graft-ssd-nb") + "/idx"),
        StreamingSemanticDedup.readVecs(spark, tmp("graft-ssd-nv") + "/idx"),
        16,
        8,
        0.8
      )
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.isNullAt(2)))
      .toSeq
    assert(v == Seq((7L, "unique", true)), s"trigram-less arrival lost from the spine: $v")
  }

  test("a replayed epoch replaces its own rows in BOTH subtables") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")
    ).toDF("vec_id", "content")
    val dir = tmp("graft-ssd-replay")
    val vecs = StreamingSemanticDedup.featurize(docs)
    StreamingSemanticDedup.appendEpoch(vecs, dir, 7L, 16, 8)
    val bandsOnce = spark.read.parquet(s"$dir/bands").count()
    val vecsOnce = spark.read.parquet(s"$dir/vecs").count()
    StreamingSemanticDedup.appendEpoch(vecs, dir, 7L, 16, 8) // checkpoint replay
    assert(spark.read.parquet(s"$dir/bands").count() == bandsOnce,
      "replay grew the band table")
    assert(spark.read.parquet(s"$dir/vecs").count() == vecsOnce,
      "replay grew the vector table")
    assert(bandsOnce == 2 * 16, "16 band rows per media expected")
    assert(vecsOnce == 2L, "one vector row per media expected")
  }

  test("an index refuses appends under a drifted band geometry") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("vec_id", "content")
    val dir = tmp("graft-ssd-geom")
    val vecs = StreamingSemanticDedup.featurize(docs)
    StreamingSemanticDedup.appendEpoch(vecs, dir, 0L, 16, 8)
    val e = intercept[IllegalArgumentException] {
      StreamingSemanticDedup.appendEpoch(vecs, dir, 1L, 32, 4)
    }
    assert(e.getMessage.contains("geometry"), s"wrong failure: ${e.getMessage}")
  }
}
