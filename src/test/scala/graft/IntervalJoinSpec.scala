package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventOps

/** Semantics certificate for j10's binned interval join: on ADVERSARIAL
  * intervals — spans covering many buckets, touching endpoints, zero
  * length, exact bucket-boundary starts/ends — the binned equi-join must
  * equal the naive overlap theta-join pair-for-pair. Session data never
  * produces these shapes (gap-bounded sessions span ≤2 day-buckets), so
  * the oracle row alone would leave the multi-bucket dedup trick — the
  * part that matters at other bucket widths — untested.
  */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val W = 100L // tiny bucket width so spans cover many buckets

  private def pairKey(r: org.apache.spark.sql.Row): (Long, Long, Long, Long, Long, Long) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))

  private def check(iv: Seq[(Long, Long, Long)]): Unit = {
    import spark.implicits._
    val df = iv.toDF("user_id", "s_us", "e_us").cache()
    val binned = EventOps
      .intervalOverlapPairs(df, W)
      .select("user_a", "s_a", "e_a", "user_b", "s_b", "e_b")
      .collect()
      .map(pairKey)
    val naive = df
      .as("a")
      .join(
        df.as("b"),
        col("a.user_id") < col("b.user_id") &&
          col("a.s_us") <= col("b.e_us") && col("b.s_us") <= col("a.e_us")
      )
      .select(
        col("a.user_id"), col("a.s_us"), col("a.e_us"),
        col("b.user_id"), col("b.s_us"), col("b.e_us")
      )
      .collect()
      .map(pairKey)
    df.unpersist()
    // exactly-once: multiset equality (duplicate emission would survive a
    // set compare — group and count both sides)
    val bGrouped = binned.groupBy(identity).view.mapValues(_.length).toMap
    val nGrouped = naive.groupBy(identity).view.mapValues(_.length).toMap
    assert(bGrouped == nGrouped,
      s"binned != naive: only-binned=${bGrouped.keySet -- nGrouped.keySet} " +
        s"only-naive=${nGrouped.keySet -- bGrouped.keySet} " +
        s"dupes=${bGrouped.filter(_._2 > 1)}")
  }

  test("hand-built edges: touching endpoints, zero length, boundary-aligned, long spans") {
    check(Seq(
      (1L, 0L, 1000L),     // spans 11 buckets
      (2L, 1000L, 1000L),  // zero-length, touches 1's end exactly
      (3L, 1001L, 2000L),  // adjacent, NO overlap with 1
      (4L, 100L, 100L),    // zero-length on a bucket boundary
      (5L, 99L, 101L),     // straddles a boundary, overlaps 4
      (6L, 200L, 5000L),   // long span containing several others
      (7L, 4999L, 4999L),  // zero-length inside 6
      (8L, 0L, 0L),        // zero-length at origin
      (9L, 300L, 399L)     // exactly one bucket, inside 6
    ))
  }

  /** j10b's sweep vs the naive definition: per bucket, the max over all
    * instants of |intervals covering that instant| (it suffices to probe
    * interval START instants clamped into the bucket — concurrency only
    * rises at a start), and n_sessions = |intervals intersecting the
    * bucket|. Computed driver-side on the same adversarial fixtures. */
  private def checkSweep(iv: Seq[(Long, Long, Long)]): Unit = {
    import spark.implicits._
    val df = iv.toDF("user_id", "s_us", "e_us")
    val swept = EventOps
      .concurrencyProfile(df, W)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val buckets = iv.flatMap { case (_, s, e) => (s / W) to (e / W) }.distinct
    val naive = buckets.map { b =>
      val inBucket = iv.filter { case (_, s, e) => s / W <= b && b <= e / W }
      val probes = inBucket.map { case (_, s, _) => math.max(s, b * W) }.distinct
      val maxC = probes.map(t => inBucket.count { case (_, s, e) => s <= t && t <= e }).max
      b -> ((inBucket.size.toLong, maxC.toLong))
    }.toMap
    assert(swept == naive,
      s"sweep != naive: only-sweep=${swept.toSet -- naive.toSet} only-naive=${naive.toSet -- swept.toSet}")
  }

  test("concurrency sweep equals naive per-instant counting on the adversarial fixtures") {
    checkSweep(Seq(
      (1L, 0L, 1000L), (2L, 1000L, 1000L), (3L, 1001L, 2000L),
      (4L, 100L, 100L), (5L, 99L, 101L), (6L, 200L, 5000L),
      (7L, 4999L, 4999L), (8L, 0L, 0L), (9L, 300L, 399L)
    ))
    val rnd = new scala.util.Random(7)
    checkSweep((1L to 200L).map { uid =>
      val s = rnd.nextInt(2000).toLong
      (uid, s, s + rnd.nextInt(600).toLong)
    })
  }

  test("randomized intervals match the naive join pair-for-pair") {
    val rnd = new scala.util.Random(42)
    val iv = (1L to 300L).map { uid =>
      val s = rnd.nextInt(2000).toLong
      val len = rnd.nextInt(4) match {
        case 0 => 0L                      // point interval
        case 1 => rnd.nextInt(50).toLong  // sub-bucket
        case 2 => rnd.nextInt(500).toLong // multi-bucket
        case _ => rnd.nextInt(2000).toLong // giant span
      }
      (uid, s, s + len)
    }
    check(iv)
  }
}
