package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.F
import graft.operators.TextOps
import graft.sources.Tables

/** Bit-parity of the custom ShingleHashes Generator against the
  * compositional pipeline it replaced (posexplode + lead windows +
  * xxhash64 + dedupe/count/rank windows) — the proof that swapping the
  * build side changed the PLAN (shuffle-free) and not the DATA.
  */
class ShingleGeneratorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The round-1 compositional form, kept verbatim as the reference. */
  private def compositional(documents: org.apache.spark.sql.DataFrame) = {
    val byDocPos = Window.partitionBy("doc_id").orderBy("pos")
    val byDoc = Window.partitionBy("doc_id").orderBy("shingle")
    val byDocAll = Window.partitionBy("doc_id")
    documents
      .select(col("doc_id"), posexplode(F.wsTokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead("tok", 1).over(byDocPos))
      .withColumn("t2", lead("tok", 2).over(byDocPos))
      .filter(col("t2").isNotNull)
      .select(
        col("doc_id"),
        xxhash64(concat_ws(" ", col("tok"), col("t1"), col("t2"))).as("shingle")
      )
      .withColumn("prev", lag("shingle", 1).over(byDoc))
      .filter(col("prev").isNull || col("prev") =!= col("shingle"))
      .drop("prev")
      .withColumn("sz", count(lit(1)).over(byDocAll).cast("int"))
      .withColumn("rn", row_number().over(byDoc))
  }

  test("generator output is bit-identical to the compositional window pipeline") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val gen = TextOps
      .shingleRows(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
    val ref = compositional(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(gen.nonEmpty)
    assert(gen == ref, s"only-gen=${(gen -- ref).take(3)} only-ref=${(ref -- gen).take(3)}")
  }

  test("edge cases: short, empty, duplicated-shingle, whitespace-heavy docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two"), // < 3 tokens -> no shingles
      (2L, ""), // empty -> none
      (3L, "  a   b  c  "), // whitespace runs collapse like wsTokens
      (4L, "x y z x y z x y z") // repeated trigrams dedupe
    ).toDF("doc_id", "text")
    val out = TextOps.shingleRows(docs).collect()
    assert(!out.exists(r => r.getLong(0) == 1L || r.getLong(0) == 2L))
    val d3 = out.filter(_.getLong(0) == 3L)
    assert(d3.length == 1 && d3.head.getInt(2) == 1 && d3.head.getInt(3) == 1)
    val d4 = out.filter(_.getLong(0) == 4L)
    // 7 trigram positions but only 3 distinct trigrams (xyz, yzx, zxy)
    assert(d4.length == 3 && d4.forall(_.getInt(2) == 3))
    assert(d4.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3))
    // rn follows ascending signed hash order
    assert(d4.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq ==
      d4.map(_.getLong(1)).sorted.toSeq)
  }

  /** The round-1 winnowing build, kept verbatim as the reference. */
  private def winnowCompositional(documents: org.apache.spark.sql.DataFrame) = {
    val W = 4
    val byDocPos = Window.partitionBy("doc_id").orderBy("pos")
    val wmin = byDocPos.rowsBetween(Window.currentRow, W - 1)
    documents
      .select(col("doc_id"), posexplode(F.wsTokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead("tok", 1).over(byDocPos))
      .withColumn("t2", lead("tok", 2).over(byDocPos))
      .filter(col("t2").isNotNull)
      .select(
        col("doc_id"),
        col("pos"),
        // same cross-engine hash as the generator: md5 first 8 hex chars
        conv(substring(md5(concat_ws(" ", col("tok"), col("t1"), col("t2"))), 1, 8), 16, 10)
          .cast("long")
          .as("h")
      )
      .withColumn("win_min", min("h").over(wmin))
      .withColumn("wn", count(lit(1)).over(wmin))
      .filter(col("wn") === W || col("pos") === 0)
      .select(col("doc_id"), col("win_min").as("fp"))
      .distinct()
  }

  test("winnow generator matches the compositional windowed-min pipeline") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val gen = docs
      .selectExpr("doc_id", "graft_winnow(text) AS (fp, nfp, rn)")
      .select("doc_id", "fp")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val ref = winnowCompositional(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(gen.nonEmpty)
    assert(gen == ref, s"only-gen=${(gen -- ref).take(3)} only-ref=${(ref -- gen).take(3)}")
  }

  test("stop-fingerprint cap: df==cap kept, df==cap+1 dropped, drop count exact") {
    import spark.implicits._
    val cap = TextOps.stopFpDfCap
    // fp 100 in exactly `cap` docs (boundary-kept), fp 200 in cap+1
    // (boundary-dropped), fp 300 in 1 (kept)
    val postings =
      (0 until cap).map(i => (i.toLong, 100L)) ++
        (0 until cap + 1).map(i => (i.toLong, 200L)) ++
        Seq((0L, 300L))
    val fp = postings.toDF("doc_id", "fp")
    val (kept, dropped) = TextOps.stopFingerprints(fp, cap)
    assert(kept.collect().map(_.getLong(0)).toSet == Set(100L, 300L))
    val d = dropped.collect()
    assert(d.length == 1)
    assert(d.head.getLong(0) == 1L) // one hot fingerprint dropped
    assert(d.head.getLong(1) == (cap + 1).toLong) // its postings counted
  }

  test("stop-fingerprint property: kept set == {fp : df <= cap}, counts reconcile") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 5).foreach { trial =>
      val cap = 1 + rnd.nextInt(6)
      // random posting list: fps with document frequencies straddling cap
      val postings = (0 until 40).flatMap { fpId =>
        val df = 1 + rnd.nextInt(2 * cap + 2)
        (0 until df).map(doc => (doc.toLong, fpId.toLong))
      }
      val expectedKept = postings.groupBy(_._2).filter(_._2.size <= cap).keySet
      val expectedDroppedPostings =
        postings.groupBy(_._2).filter(_._2.size > cap).values.map(_.size.toLong).sum
      val (kept, dropped) = TextOps.stopFingerprints(postings.toDF("doc_id", "fp"), cap)
      assert(kept.collect().map(_.getLong(0)).toSet == expectedKept, s"trial=$trial cap=$cap")
      val d = dropped.collect().head
      assert(d.getLong(0) == (40 - expectedKept.size).toLong, s"trial=$trial")
      assert(d.getLong(1) == expectedDroppedPostings, s"trial=$trial")
    }
  }

  test("stop-fingerprint drop stats are zero-row-safe when nothing is hot") {
    import spark.implicits._
    val fp = Seq((1L, 10L), (2L, 10L), (3L, 11L)).toDF("doc_id", "fp")
    val (kept, dropped) = TextOps.stopFingerprints(fp, 32)
    assert(kept.count() == 2)
    val d = dropped.collect().head
    assert(d.getLong(0) == 0L && d.getLong(1) == 0L)
  }

  test("graft_gram_embed matches the compositional md5-hex scatter pipeline") {
    // Independent reference: Spark's built-in md5() + conv() hex decode +
    // lead-window trigram assembly + groupBy scatter — a different md5
    // implementation and a different accumulation path than the fused
    // expression's MessageDigest loop.
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables
      .documents(spark, "/root/testdata/sf0.001")
      .limit(50)
      .cache()
    val byDocPos = Window.partitionBy("doc_id").orderBy("pos")
    val expected = docs
      .select(col("doc_id"), posexplode(F.wsTokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead("tok", 1).over(byDocPos))
      .withColumn("t2", lead("tok", 2).over(byDocPos))
      .filter(col("t2").isNotNull)
      .withColumn(
        "h",
        conv(substring(md5(concat_ws(" ", col("tok"), col("t1"), col("t2"))), 1, 8), 16, 10)
          .cast("long")
      )
      .withColumn("dim", (col("h") % 64).cast("int"))
      .withColumn("s", when((col("h") / 64).cast("long") % 2 === 0, 1.0).otherwise(-1.0))
      .groupBy("doc_id", "dim")
      .agg(sum("s").as("v"))
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2)))
      .toMap
    val got = docs
      .select(col("doc_id"), call_function("graft_gram_embed", col("text")).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(got.nonEmpty && got.forall(_._2.length == 64))
    got.foreach { case (docId, e) =>
      (0 until 64).foreach { d =>
        val want = expected.getOrElse((docId, d), 0.0).toFloat
        assert(e(d) == want, s"doc=$docId dim=$d got=${e(d)} want=$want")
      }
    }
    docs.unpersist()
  }

  test("the t4 build side plan has no shuffle before the candidate join") {
    val plan = TextOps
      .shingleRows(Tables.documents(spark, "/root/testdata/sf0.001"))
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("Generate"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
