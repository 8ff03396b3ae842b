package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorOps

/** Gates for the v35/v36 logistic-regression trainer that the value
  * oracle can't express: the model actually DESCENDS (accuracy well
  * above the majority floor, weights concentrated on the teacher dims),
  * the integer gradient ledger is partitioning-independent, and a
  * cleanly separable corpus trains to a perfect confusion matrix.
  */
class LogregSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("v36 beats the majority floor and v35 recovers the teacher dims (sf0.01)") {
    val cells = VectorOps
      .queries("v36_logreg_score")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val n = cells.values.sum
    val correct = cells.getOrElse((0L, 0L), 0L) + cells.getOrElse((1L, 1L), 0L)
    // majority class is 250/500 here; a degenerate model reads 0.5
    assert(correct.toDouble / n > 0.9, s"accuracy ${correct.toDouble / n}")
    // both error cells exist — the matrix is not a single-class collapse
    assert(cells.contains((0L, 1L)) && cells.contains((1L, 0L)))

    val wFinal = VectorOps
      .queries("v35_logreg_fit")(spark, sf)
      .filter(org.apache.spark.sql.functions.col("iter") === VectorOps.logregIters)
      .collect()
      .map(r => r.getLong(1) -> r.getLong(3))
      .toMap
    // teacher rule is sign(x1 + x2): those two weights dominate the rest
    val teacher = math.min(math.abs(wFinal(1L)), math.abs(wFinal(2L)))
    (0L to VectorOps.logregFeatures.toLong)
      .filterNot(j => j == 1L || j == 2L)
      .foreach(j => assert(math.abs(wFinal(j)) < teacher, s"w$j vs teacher"))
  }

  test("integer gradient ledger is independent of partitioning") {
    val feats = VectorOps.logregFeatureFrame(spark, sf)
    val w = Array(0.01, -0.2, 0.15, 0.0, 0.3, -0.05, 0.02, 0.001)
    val (g3, n3) = VectorOps.logregGradients(feats.repartition(3), w)
    val (g11, n11) = VectorOps.logregGradients(feats.repartition(11), w)
    assert(n3 == n11)
    assert(g3.toSeq == g11.toSeq)
  }

  test("a separable corpus trains to a perfect confusion matrix") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-logreg").toString
    // dims 0/1 carry the class at distance ±2; the rest is small noise
    val rows = (0 until 200).map { i =>
      val pos = i % 2 == 0
      val a = if (pos) 2.0f else -2.0f
      val noise = (2 until 64).map(j => ((i * 37 + j * 11) % 19 - 9) / 100.0f)
      (i.toLong, (Seq(a, a / 2) ++ noise).toArray, i % 10)
    }
    rows
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val cells = VectorOps
      .queries("v36_logreg_score")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(cells.getOrElse((0L, 0L), 0L) == 100L)
    assert(cells.getOrElse((1L, 1L), 0L) == 100L)
    assert(!cells.contains((0L, 1L)) && !cells.contains((1L, 0L)))
  }
}
