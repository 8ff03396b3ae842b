package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKAggregator

/** Exhaustive-ish randomized check of the primitive-array bounded heap:
  * any input multiset, any partition split, any merge order must equal the
  * sort-take reference (value desc, key asc). Seeded — deterministic.
  */
class TopKAggregatorSpec extends AnyFunSuite {

  private def reference(entries: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    entries.sortBy { case (key, v) => (-v, key) }.take(k)

  test("reduce+merge over arbitrary partition splits equals the sort-take reference") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 300) {
      val n = rnd.nextInt(40)
      val k = 1 + rnd.nextInt(7)
      // small key/value ranges force heavy ties and duplicates
      val entries = Seq.fill(n)((rnd.nextInt(20).toLong, rnd.nextInt(10).toLong))
      val agg = new TopKAggregator(k)
      val nParts = 1 + rnd.nextInt(4)
      val size = math.max(1, math.ceil(n.toDouble / nParts).toInt)
      val buffers = entries.grouped(size).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = buffers.foldLeft(agg.zero)(agg.merge)
      assert(
        agg.finish(merged) == reference(entries, k),
        s"trial=$trial k=$k parts=$nParts entries=$entries"
      )
    }
  }

  test("buffer never exceeds k entries") {
    val agg = new TopKAggregator(3)
    val buf = (1L to 100L).map(i => (i, i)).foldLeft(agg.zero)(agg.reduce)
    assert(buf.length == 6) // 3 entries x 2 longs
    assert(agg.finish(buf) == Seq((100L, 100L), (99L, 99L), (98L, 98L)))
  }
}
