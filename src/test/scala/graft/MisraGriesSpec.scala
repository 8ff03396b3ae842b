package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGriesAggregator

/** Randomized check of the mergeable Misra-Gries sketch: over any input
  * multiset, any partition split, and any merge order, the sketch must
  * (a) keep at most k entries, (b) never overestimate a count, (c) keep
  * the per-item underestimate within n/(k+1), and therefore (d) contain
  * EVERY item with true frequency > n/(k+1) — the superset guarantee the
  * a16 two-pass heavy-hitters query is exact because of. Seeded —
  * deterministic.
  */
class MisraGriesSpec extends AnyFunSuite {

  test("sketch survivors form a superset of true heavy hitters under any split") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 300) {
      val n = 1 + rnd.nextInt(400)
      val k = 2 + rnd.nextInt(12)
      // skewed synthetic stream: a few hot items over a long tail
      val items = Seq.fill(n) {
        val r = rnd.nextInt(10)
        if (r < 5) s"hot${rnd.nextInt(3)}" else s"cold${rnd.nextInt(50)}"
      }
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val agg = new MisraGriesAggregator(k)
      val nParts = 1 + rnd.nextInt(5)
      val size = math.max(1, math.ceil(n.toDouble / nParts).toInt)
      val buffers = items.grouped(size).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      // fold in a rotated order so the merge tree varies across trials
      val rot = rnd.nextInt(buffers.size)
      val merged = (buffers.drop(rot) ++ buffers.take(rot))
        .foldLeft(agg.zero)(agg.merge)
      assert(merged.size <= k, s"trial=$trial buffer grew past k=$k")
      val bound = n.toDouble / (k + 1)
      merged.foreach { case (t, est) =>
        val tc = truth(t)
        assert(est <= tc, s"trial=$trial $t overestimated: est=$est true=$tc")
        assert(tc - est <= bound + 1e-9,
          s"trial=$trial $t underestimate ${tc - est} exceeds n/(k+1)=$bound")
      }
      truth.foreach { case (t, tc) =>
        if (tc > bound)
          assert(merged.contains(t),
            s"trial=$trial heavy item $t (freq=$tc > $bound) missing from sketch")
      }
    }
  }
}
