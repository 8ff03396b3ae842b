package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap top-K typed Aggregator — the scale form of the reference's
  * `ARRAY_AGG(STRUCT(...) ORDER BY ratio DESC LIMIT K)`
  * (user_activity.sql:249,319; SURVEY §7.4).
  *
  * This Aggregator keeps only K entries per partial buffer, so the
  * map-side combine ships at most K rows per group per partition —
  * O(groups x K x partitions) shuffle volume. Note that Spark's
  * WindowGroupLimit rule gives the `row_number() <= K` window form
  * (`a9_topk_per_group`) the SAME map-side pruning since 3.5, and the two
  * forms measure within ~10% of each other at sf0.1 (heap ~1.5 s, window
  * ~1.4 s). The Aggregator's remaining edge is composability: inside a
  * single `groupBy().agg(...)` it computes top-K ALONGSIDE other
  * aggregates in one shuffle, where the window form needs a window pass
  * plus a separate aggregation plus a join. Ordering matches a9 exactly:
  * value desc, key asc.
  *
  * The buffer is an interleaved primitive Array[Long] of (key, value) pairs
  * kept sorted by (value desc, key asc), length <= 2k. A primitive array
  * round-trips through the partial-merge serializer as one UnsafeArrayData
  * memcpy — the round-1 Kryo List buffer spent more time serializing than
  * aggregating and made the heap form LOSE to the window form at sf0.1.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]] {

  // (value desc, key asc) entry ordering shared by reduce and merge
  private def beats(k1: Long, v1: Long, k2: Long, v2: Long): Boolean =
    v1 > v2 || (v1 == v2 && k1 < k2)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val n = buf.length / 2
    val key = in._1
    val value = in._2
    // hot path: most rows lose to the current k-th entry and cost one compare
    if (n >= k && !beats(key, value, buf(2 * n - 2), buf(2 * n - 1))) buf
    else {
      var i = 0
      while (i < n && beats(buf(2 * i), buf(2 * i + 1), key, value)) i += 1
      val m = math.min(n + 1, k)
      val out = new Array[Long](2 * m)
      Array.copy(buf, 0, out, 0, 2 * i)
      out(2 * i) = key
      out(2 * i + 1) = value
      val rem = m - i - 1
      if (rem > 0) Array.copy(buf, 2 * i, out, 2 * (i + 1), 2 * rem)
      out
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val na = a.length / 2
    val nb = b.length / 2
    val m = math.min(na + nb, k)
    val out = new Array[Long](2 * m)
    var i = 0
    var j = 0
    var o = 0
    while (o < m) {
      val takeA =
        j >= nb || (i < na && beats(a(2 * i), a(2 * i + 1), b(2 * j), b(2 * j + 1)))
      if (takeA) {
        out(2 * o) = a(2 * i); out(2 * o + 1) = a(2 * i + 1); i += 1
      } else {
        out(2 * o) = b(2 * j); out(2 * o + 1) = b(2 * j + 1); j += 1
      }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Long]): Seq[(Long, Long)] =
    (0 until buf.length / 2).map(i => (buf(2 * i), buf(2 * i + 1)))

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}
