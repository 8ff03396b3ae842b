package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide structural pins: properties every declared query's
  * physical plan must hold for the catalog to survive a 100× scale-up.
  * Value-level correctness lives in the DuckDB oracles; these assertions
  * keep the PLANS from regressing (a query can stay hash-green while its
  * join strategy silently degrades to something that dies at scale).
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("no declared query plans an unbroadcast cartesian product") {
    // CartesianProductExec materializes |L|x|R| with BOTH sides shuffled —
    // never acceptable; the intentional all-pairs baselines (v1/v2) and
    // the literal-table probes must all ride BroadcastNestedLoopJoin,
    // where the small side is broadcast by design.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = plan(name)
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("IVF probe joins build on the broadcast probe side, never shuffling the index") {
    for (q <- Seq("v6_ann_ivf", "v10_ann_ivf_quantized")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast probe join")
      assert(!p.contains("SortMergeJoin"), s"$q index side got shuffled:\n$p")
    }
  }

  test("post-aggregation metric assemblies plan with zero sort-merge joins") {
    // bounded (week, country/nation) keyspace -> every assembly join
    // must be a broadcast hash join regardless of fact-table size
    for (q <- Seq("j3_weekly_metrics", "ua_full_pipeline")) {
      assert(!plan(q).contains("SortMergeJoin"), s"$q regressed to sort-merge")
    }
  }

  test("rank-then-filter queries keep Spark 4's WindowGroupLimit pushdown engaged") {
    // row_number + rank<=k must plan the partial/final group-limit pair —
    // without it every partition sorts its FULL group before the filter,
    // which is the difference between top-k and global-sort cost at scale
    for (q <- Seq("a9_topk_per_group", "e10_latest_per_key", "v13_mmr_rerank")) {
      assert(plan(q).contains("WindowGroupLimit"), s"$q lost the group-limit pushdown")
    }
    // the GLOBAL top-n plans as the even cheaper TakeOrderedAndProject
    // (per-partition heap + merge — no global sort ever materializes)
    assert(plan("w2_top_n").contains("TakeOrderedAndProject"), "w2 regressed to a global sort")
  }

  test("the fused weekly-stats pass aggregates mau/wau/intensity/npr in one shuffle") {
    // one HashAggregate pair over ONE Exchange for the fused groupBy —
    // visible as exactly one exchange keyed on (week_start, country_name)
    // feeding an aggregate with all four measures
    val p = plan("ua_full_pipeline")
    val fusedAggs = p.linesIterator
      .filter(l => l.contains("HashAggregate") || l.contains("ObjectHashAggregate"))
      .count(l => l.contains("mau") && l.contains("intensity") && l.contains("new_profile_rate"))
    assert(fusedAggs >= 1, s"fused weekly aggregate missing:\n$p")
  }
}
