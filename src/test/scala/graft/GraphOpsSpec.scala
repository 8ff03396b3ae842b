package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Property check for the min-label propagation: on randomized graphs the
  * fixpoint must equal a reference union-find's components (exercises
  * chains, cycles, stars, singleton-free edge sets — shapes the planted
  * testdata never produces).
  */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the min representative
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("connected components match union-find on randomized graphs") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 40 + rnd.nextInt(40)
      val m = rnd.nextInt(n * 2)
      val pairs = Seq.fill(m) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val expected = unionFind(n, pairs)
      val got = GraphOps
        .connectedComponents(
          GraphOps.bidirectional(pairs.toDF("a", "b"), "a", "b").cache()
        )
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      // the helper labels only edge members; members must carry the
      // union-find component's min id
      val members = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      assert(got.keySet == members, s"seed $seed member set")
      members.foreach { id =>
        assert(got(id) == expected(id), s"seed $seed node $id")
      }
    }
  }

  test("a long chain converges to one component within the round cap") {
    import spark.implicits._
    // worst-case diameter for propagation: a 60-node path
    val pairs = (0L until 59L).map(i => (i, i + 1))
    val got = GraphOps
      .connectedComponents(
        GraphOps.bidirectional(pairs.toDF("a", "b"), "a", "b").cache()
      )
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got.size == 60 && got.values.forall(_ == 0L))
  }

  test("adversarial diameter: a 1200-node path needs pointer-jumping and gets it") {
    import spark.implicits._
    // plain min-label propagation moves the min ONE hop per round — a
    // 1200-node path would need ~1200 rounds and trip the 64-round cap.
    // Pointer-jumping (engaged after round 8) composes label lookups, so
    // the covered radius roughly doubles per round: convergence must land
    // within ~8 + log2(n) rounds. Two disjoint chains prove labels don't
    // bleed across components while shortcutting.
    val chainA = (0L until 1199L).map(i => (i, i + 1))
    val chainB = (2000L until 2999L).map(i => (i, i + 1))
    val pairs = (chainA ++ chainB).toDF("a", "b")
    val (labels, rounds) = GraphOps.connectedComponentsWithRounds(
      GraphOps.bidirectional(pairs, "a", "b").cache()
    )
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rounds < 20, s"pointer-jumping should converge in <20 rounds, took $rounds")
    assert(got.size == 1200 + 1000)
    (0L to 1199L).foreach(i => assert(got(i) == 0L, s"chain A node $i"))
    (2000L to 2999L).foreach(i => assert(got(i) == 2000L, s"chain B node $i"))
  }

  test("v22 integer-scaled pagerank tracks the double recurrence within 1e-6") {
    // the BIGINT scaling exists for cross-engine hash determinism, not to
    // change semantics: each per-edge floor loses < 1e-12 of mass, so
    // after 3 damped iterations the scaled ranks must sit on top of the
    // exact double-precision recurrence
    val sf = "/root/testdata/sf0.001"
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val edges = graft.operators.VectorOps
      .knnGraph(emb)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val verts = emb.select("vec_id").collect().map(_.getLong(0))
    val n = verts.length
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    var rank = verts.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      edges.foreach { case (s0, d0) => contrib(d0) += rank(s0) / outdeg(s0) }
      rank = verts.map(v => v -> (0.15 / n + 0.85 * contrib(v))).toMap
    }
    val got = SparkEntry
      .queries("v22_graph_pagerank")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got.keySet == verts.toSet, "vertex set mismatch")
    verts.foreach { v =>
      assert(
        math.abs(got(v) / 1e12 - rank(v)) < 1e-6,
        s"node $v: scaled=${got(v) / 1e12} exact=${rank(v)}"
      )
    }
  }
}
