package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorOps

/** BM25 (v37) property gates the value oracle can't express: the three
  * behaviors that distinguish BM25 from v14's tf·idf — rarity dominance,
  * term-frequency saturation, and document-length normalization — each
  * pinned on a crafted corpus where the expected ordering is hand-derived.
  */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("BM25 orders by rarity, saturates tf, and penalizes length") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    Seq(
      (0L, "alpha beta"), // the query doc
      (10L, "alpha x1 x2 x3"), // 1×alpha, short
      (11L, "alpha alpha alpha alpha alpha alpha x4 x5"), // 6×alpha
      (12L, "alpha y1 y2 y3 y4 y5 y6 y7 y8 y9 y10 y11 y12 y13 y14 y15 y16 y17 y18 y19 y20"), // 1×alpha, long
      (13L, "beta f1 f2 f3"), // 1×beta (rare term)
      (14L, "alpha g1 g2 g3") // 1×alpha (common term), same length as 13
    ).map { case (id, t) => (id, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val scores = VectorOps
      .queries("v37_bm25_topk")(spark, dir)
      .collect()
      .map(r => r.getLong(2) -> r.getLong(3))
      .toMap
    // rarity: beta (df=2) outweighs alpha (df=5) at equal tf and length
    assert(scores(13L) > scores(14L), s"rarity: $scores")
    // saturation: 6×alpha beats 1×alpha, but nowhere near 6×
    assert(scores(11L) > scores(10L), s"tf monotone: $scores")
    assert(scores(11L) < 3L * scores(10L), s"tf saturates: $scores")
    // length norm: same single alpha scores lower in the 21-token doc
    assert(scores(10L) > scores(12L), s"length norm: $scores")
  }
}
