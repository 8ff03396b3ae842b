package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Structural guarantees for the corpus-packaging operators (t9/t10) that
  * the value-level oracle can't express: plan shape and packing
  * invariants.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("t9 shards are contiguous, ordered, and within budget + one doc") {
    val rows = TextOps
      .queries("t9_token_shards")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // shard ids start at 0 and never decrease in doc order
    assert(rows.head._4 == 0L)
    assert(rows.sliding(2).forall { case Array(a, b) => b._4 >= a._4; case _ => true })
    // cum_tokens is the running sum of n_tokens
    var cum = 0L
    rows.foreach { case (_, n, c, _) => cum += n; assert(c == cum) }
    // every shard's token total is under budget plus its last document
    // (greedy packing property: a doc only spills when the budget is hit)
    val budget = 10000L
    rows.groupBy(_._4).foreach { case (_, docs) =>
      val total = docs.map(_._2).sum
      assert(total <= budget + docs.last._2)
    }
  }

  test("t10 streams the corpus through a broadcast join (no training-side shuffle)") {
    val plan = TextOps
      .queries("t10_decontaminate")(spark, sf)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    // contaminated pairs found in the planted near-dup corpus
    val n = TextOps.queries("t10_decontaminate")(spark, sf).count()
    assert(n > 0)
  }
}
