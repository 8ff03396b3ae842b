package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed, MERGEABLE Aggregator —
  * the constant-memory first pass of exact distributed heavy hitters
  * (candidate generation), complementing [[TopKAggregator]] (which bounds
  * per-GROUP state; this bounds GLOBAL state over an unbounded key
  * domain).
  *
  * Buffer = at most k (token, count) survivors. reduce: increment a
  * present key; insert when below capacity; otherwise decrement every
  * counter by 1 and drop zeros (the classic MG step). merge: sum the two
  * maps, then subtract the (k+1)-th largest count from everything and
  * keep the positives — the mergeable-summaries form (Agarwal et al.
  * 2013, "Mergeable Summaries", public paper), whose error bound
  * true − est ≤ n/(k+1) holds under ANY merge tree, which is exactly
  * what a partial-aggregated Spark plan needs: every executor ships ≤ k
  * entries whatever its input size, and the guarantee survives AQE
  * re-planning the combine order.
  *
  * Consequence used by the a16 query: any token with true frequency
  * > n/(k+1) MUST survive in the sketch (its estimate stays positive), so
  * a second exact-count pass over just the ≤ k candidates yields the TRUE
  * heavy-hitter set — no approximation left in the output, which is why
  * a16 carries a plain (non-semi) DuckDB oracle.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c)              => b.updated(tok, c + 1)
      case None if b.size < k   => b.updated(tok, 1L)
      case None =>
        // decrement-all: one unmatched arrival cancels one unit of every
        // survivor (k+1 distinct items "pay" together)
        b.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  override def merge(
      a: Map[String, Long],
      b: Map[String, Long]
  ): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest count — removes >= m.size - k keys
      val kth = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.collect { case (t, c) if c > kth => t -> (c - kth) }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
