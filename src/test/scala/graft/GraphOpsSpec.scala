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
}
