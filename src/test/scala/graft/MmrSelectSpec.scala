package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** Behavioral gates for the MMR Generator: the whole point of the operator
  * is that it does NOT return the pure relevance ranking when the top
  * candidates are redundant — pinned here on a constructed fixture, since
  * the driver's embeddings corpus has no near-duplicate vectors.
  */
class MmrSelectSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", false)
    .getOrCreate()

  /** (id, rel, vec): ids 1 and 2 are near-identical vectors with the two
    * highest relevances; id 3 is orthogonal with lower relevance. Pure
    * top-k would return (1, 2, 3); MMR must demote the near-copy. */
  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 0.90, Array(1.0f, 0.0f, 0.0f)),
      (2L, 0.89, Array(0.999f, 0.01f, 0.0f)),
      (3L, 0.50, Array(0.0f, 1.0f, 0.0f)),
      (4L, 0.40, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "rel", "embedding")
  }

  private def run(df: org.apache.spark.sql.DataFrame) = {
    GraftFunctions.register(spark)
    df.groupBy(lit(0).as("g"))
      .agg(collect_list(struct(col("vec_id"), col("rel"), col("embedding"))).as("cands"))
      .selectExpr("graft_mmr(cands) AS (rnk, neighbor_id, score)")
      .orderBy("rnk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
  }

  test("pick 1 is the raw-relevance argmax") {
    val out = run(fixture)
    assert(out.head == ((1L, 1L, 0.9)))
  }

  test("near-duplicate of the top pick is demoted below diverse candidates") {
    val out = run(fixture)
    val order = out.map(_._2).toSeq
    // cos(1,2) ~ 1.0 -> id 2's MMR score ~ 0.7*0.89 - 0.3*1.0 ~ 0.323,
    // below id 3 (0.7*0.5 - 0.3*0 = 0.35): diversity beats raw relevance
    assert(order.indexOf(3L) < order.indexOf(2L), s"got $order")
    assert(order.take(2) == Seq(1L, 3L), s"got $order")
  }

  test("scores are monotonically non-increasing after the first MMR pick") {
    val out = run(fixture).drop(1)
    val scores = out.map(_._3).toSeq
    assert(scores == scores.sorted.reverse, s"got $scores")
  }

  test("fewer candidates than k emits all candidates exactly once") {
    val out = run(fixture)
    assert(out.length == 4)
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L, 4L))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
  }
}
