package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap top-K typed Aggregator — the scale form of the reference's
  * `ARRAY_AGG(STRUCT(...) ORDER BY ratio DESC LIMIT K)`
  * (user_activity.sql:249,319; SURVEY §7.4).
  *
  * The window-function form (`a9_topk_per_group`) sorts every group's full
  * candidate set after a shuffle; this Aggregator keeps only K entries per
  * partial buffer, so the map-side combine ships at most K rows per group
  * per partition — the shuffle volume drops from O(candidates) to
  * O(groups x K x partitions). Ordering matches a9 exactly:
  * value desc, key asc.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), List[(Long, Long)], Seq[(Long, Long)]] {

  // entries as (key, value); kept sorted by (value desc, key asc), length <= k
  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  override def zero: List[(Long, Long)] = Nil

  override def reduce(buf: List[(Long, Long)], in: (Long, Long)): List[(Long, Long)] =
    // hot path: most rows lose to the current k-th entry and cost one compare
    if (buf.length >= k && !better(in, buf.last)) buf
    else {
      val (pre, post) = buf.span(e => better(e, in))
      (pre ::: in :: post).take(k)
    }

  override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
    (a ++ b).sortBy { case (key, value) => (-value, key) }.take(k)

  override def finish(buf: List[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[List[(Long, Long)]] =
    Encoders.kryo[List[(Long, Long)]]

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
