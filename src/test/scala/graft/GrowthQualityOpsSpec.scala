package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EventOps, TextOps, VectorOps}
import graft.sources.Tables
import graft.functions.F

/** Invariant gates for the round-8b additions (e21 growth accounting,
  * t45 paragraph dedup, t47 classifier inference, v24 Hamming ANN,
  * v25 matryoshka recall) — the algebraic identities the value-level
  * DuckDB oracle checks can't articulate.
  */
class GrowthQualityOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("e21 ledger identities: actives = new+retained+resurrected; churn = prior actives - retained") {
    val out = EventOps
      .queries("e21_growth_accounting")(spark, sf)
      .collect()
      .map(r =>
        (
          r.getString(0),
          r.getDate(1).toLocalDate,
          r.getLong(2),
          r.getLong(3),
          r.getLong(4),
          r.getLong(5)
        )
      )
    assert(out.nonEmpty)
    // independent actives count straight off the events table
    val actives = Tables
      .events(spark, sf)
      .select(col("event_type"), col("user_id"), F.weekStart(col("ts")).as("week"))
      .distinct()
      .groupBy("event_type", "week")
      .count()
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate), r.getLong(2)))
      .toMap
    out.foreach { case (et, wk, nNew, nRet, nRes, _) =>
      // churn-only weeks (no actives) legitimately carry (0, 0, 0, n)
      assert(
        actives.getOrElse((et, wk), 0L) == nNew + nRet + nRes,
        s"actives identity at ($et, $wk)"
      )
    }
    // churned(w) = actives(w-7) - retained(w), for every week after the first
    val horizon = out.map(_._2).max
    out.foreach { case (et, wk, _, nRet, _, nChurn) =>
      actives.get((et, wk.minusDays(7))).foreach { prior =>
        assert(nChurn == prior - nRet, s"churn identity at ($et, $wk)")
      }
      if (wk == horizon) assert(nChurn >= 0) // horizon rows exist but are capped, never negative
    }
    // all four classes are exercised by the fixture corpus
    assert(out.map(_._3).sum > 0 && out.map(_._4).sum > 0)
    assert(out.map(_._5).sum > 0 && out.map(_._6).sum > 0)
  }

  test("t45 kept_md5 of an undropped doc reconstructs the normalized text; ledger is consistent") {
    val out = TextOps
      .queries("t45_paragraph_dedup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.nonEmpty)
    assert(out.forall { case (_, nSegs, nDropped, _, _) => nDropped <= nSegs })
    // boilerplate removal actually fires on this corpus, but never eats it whole
    val dropped = out.map(_._3).sum
    assert(dropped > 0 && dropped < out.map(_._2).sum)
    // docs with nothing dropped must reassemble to md5 of the space-joined tokens
    val expected = Tables
      .documents(spark, sf)
      .select(col("doc_id"), md5(concat_ws(" ", F.wsTokens(col("text")))).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toMap
    val untouched = out.filter(_._3 == 0L)
    assert(untouched.nonEmpty)
    untouched.foreach { case (id, _, _, _, keptMd5) =>
      assert(keptMd5 == expected(id), s"doc $id reassembly")
    }
  }

  test("t47 label is the sign of the integer score and both classes occur") {
    val out = TextOps
      .queries("t47_quality_classifier")(spark, sf)
      .collect()
      .map(r => (r.getLong(2), r.getString(4)))
    assert(out.nonEmpty)
    out.foreach { case (score, label) =>
      assert(label == (if (score >= 0) "keep" else "drop"))
    }
    assert(out.count(_._2 == "keep") > 0 && out.count(_._2 == "drop") > 0)
  }

  test("v24 hamming is bounded and the binary sketch beats chance against the exact ranking") {
    val ham = VectorOps
      .queries("v24_hamming_ann")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(ham.length == 50) // 10 probes x k=5
    assert(ham.forall { case (_, _, h) => h >= 0 && h <= 64 })
    val exact = VectorOps
      .queries("v1_ann_bruteforce")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSet)
      .toMap
    val overlap = ham
      .groupBy(_._1)
      .map { case (q, rows) => (exact(q) & rows.map(_._2).toSet).size }
    // chance overlap at k=5 over 499 candidates is ~0.05 per query; the
    // sign-bit sketch must stay well clear of it (measured: 1.2 mean)
    assert(overlap.sum.toDouble / overlap.size >= 0.5, s"mean overlap ${overlap.sum.toDouble / overlap.size}")
  }

  test("t46 weighted prefix filter loses no pair vs the naive co-shingle join") {
    // the weighted PPJoin bound, asserted directly: re-rank every
    // co-shingle pair with the same integer weights, threshold at τ=0.7,
    // and demand set equality with the prefix-filtered operator output
    import spark.implicits._
    val got = TextOps
      .queries("t46_weighted_jaccard")(spark, sf)
      .select("doc_a", "doc_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    val sh = Tables
      .documents(spark, sf)
      .selectExpr("doc_id", "graft_shingles(text) AS (shingle, sz, rn)")
      .select("doc_id", "shingle")
    val n = sh.select(countDistinct("doc_id")).as[Long].head()
    val wgt = sh
      .groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .select(col("shingle"), greatest(lit(1L), lit(n) / col("df") cast "long").as("wt"))
    val shw = sh.join(wgt, "shingle")
    val totals = shw.groupBy("doc_id").agg(sum("wt").as("tw"))
    val naive = shw
      .as("a")
      .join(shw.as("b"), "shingle")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.wt")).as("iw"))
      .join(totals.select(col("doc_id").as("doc_a"), col("tw").as("ta")), "doc_a")
      .join(totals.select(col("doc_id").as("doc_b"), col("tw").as("tb")), "doc_b")
      .filter(col("iw") * 10 >= (col("ta") + col("tb") - col("iw")) * 7)
      .select("doc_a", "doc_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(got == naive, s"prefix filter diverged: missing ${naive -- got}, extra ${got -- naive}")
    assert(got.nonEmpty)
  }

  test("graft_sign_pack matches the SQL fold bit-for-bit at both offsets on real embeddings") {
    graft.functions.GraftFunctions.register(spark)
    def fold(lo: Int) =
      expr(
        s"""aggregate(sequence(0, 31), 0L,
           |  (acc, i) -> acc + IF(element_at(embedding, i + $lo + 1) > 0, shiftleft(1L, i), 0L))""".stripMargin
      )
    val diffs = Tables
      .embeddings(spark, sf)
      .select(
        call_function("graft_sign_pack", col("embedding"), lit(0)).as("n0"),
        call_function("graft_sign_pack", col("embedding"), lit(32)).as("n1"),
        fold(0).as("f0"),
        fold(32).as("f1")
      )
      .filter(col("n0") =!= col("f0") || col("n1") =!= col("f1"))
      .count()
    assert(diffs == 0L)
    // short/empty arrays read missing dims as 0 bits; NaN reads as a 1
    // bit (SQL ordering semantics — NaN > 0 is TRUE in both Spark's
    // nan-safe compare and DuckDB — where Java's primitive > would say 0)
    import spark.implicits._
    val edge = Seq(Array(1.0f, -1.0f, 0.0f), Array.empty[Float], Array(Float.NaN, -1.0f))
      .toDF("embedding")
      .select(
        call_function("graft_sign_pack", col("embedding"), lit(0)).as("w0"),
        call_function("graft_sign_pack", col("embedding"), lit(32)).as("w1")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edge.toSeq == Seq((1L, 0L), (0L, 0L), (1L, 0L)))
    // and the fold agrees on the NaN row, pinning the cross-engine claim
    val foldNaN = Seq(Array(Float.NaN, -1.0f))
      .toDF("embedding")
      .select(
        expr(
          """aggregate(sequence(0, 1), 0L,
            |  (acc, i) -> acc + IF(element_at(embedding, i + 1) > 0, shiftleft(1L, i), 0L))""".stripMargin
        ).as("f0")
      )
      .collect()
      .head
      .getLong(0)
    assert(foldNaN == 1L)
  }

  test("v26 coarse-then-rerank recovers most of the exact top-5 and beats raw Hamming") {
    val exact = VectorOps
      .queries("v1_ann_bruteforce")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSet)
      .toMap
    def hits(q: String): Int = VectorOps
      .queries(q)(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1)
      .map { case (qid, rows) => (exact(qid) & rows.map(_._2).toSet).size }
      .sum
    val rerank = hits("v26_hamming_rerank")
    val raw = hits("v24_hamming_ann")
    // measured on this corpus: 34/50 rerank vs 12/50 raw
    assert(rerank >= 30, s"rerank recall collapsed: $rerank/50")
    assert(rerank > raw, s"rerank ($rerank) must beat the raw Hamming ranking ($raw)")
  }

  test("v25 longer prefixes recover more of the exact top-5 in aggregate") {
    val rows = VectorOps
      .queries("v25_matryoshka_recall")(spark, sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.length == 10)
    assert(rows.forall { case (h16, h32) => h16 >= 0 && h16 <= 5 && h32 >= 0 && h32 <= 5 })
    assert(rows.map(_._2).sum >= rows.map(_._1).sum)
  }
}
