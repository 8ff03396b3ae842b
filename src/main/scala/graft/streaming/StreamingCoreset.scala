package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming k-center coreset maintenance — the one-pass form of the
  * batch v32/v33 greedy k-center family, via the DOUBLING ALGORITHM
  * (Charikar–Chekuri–Feder–Motwani, "Incremental clustering and dynamic
  * information retrieval", STOC '97): each bucket keeps ≤ k centers and
  * a threshold τ with two invariants —
  *
  *   I1: kept centers are pairwise  > 2τ apart;
  *   I2: every point processed so far is within 4τ of some center.
  *
  * A new point farther than 4τ from all centers becomes a center; when
  * the set would exceed k, τ doubles and centers within 2τ of an
  * earlier-kept center are folded into it (I2 survives: a point's old
  * center moved ≤ 4τ_new/... — the textbook 8·OPT argument). State is
  * O(k·dim) floats + one double per bucket, CONSTANT in stream length —
  * this is the trade v32's Scaladoc names: greedy k-center pays k full
  * corpus scans for a 2-approximation; the stream pays ONE pass for an
  * 8-approximation per bucket.
  *
  * Composability (the reason the stream is keyed by bucket at all):
  * per-bucket coresets union into a candidate set of ≤ B·k points, and
  * a driver-side greedy k-center over that tiny set ([[mergedCenters]])
  * yields the final k exemplars. The end-to-end coverage radius is
  * bounded by max_b(4τ_b) + r_merge — both terms measured, so the spec
  * asserts the bound EXACTLY rather than trusting the constant — and is
  * quality-gated against the batch-exact v33 radius.
  *
  * Determinism: arrivals are folded in (ts, vec_id) order within each
  * micro-batch, distances are index-order Double sums, and the merge
  * keeps centers in arrival order — so the same rows in the same
  * micro-batch split reproduce bit-identical state, which the parity
  * spec checks against [[coresetBatch]] folding the identical sequence.
  * Different arrival orders yield different (all valid, all certified)
  * coresets — the certificate, not the center list, is the contract.
  *
  * State never expires (NoTimeout): the coreset IS the product, k·dim
  * bytes per bucket forever, the same lifetime-state contract as
  * [[StreamingGrowthAccounting]].
  */
object StreamingCoreset {

  final case class CoresetPoint(
      bucket: Int,
      vec_id: Long,
      embedding: Seq[Float],
      ts: Timestamp
  )

  /** centers parallel to centerIds; tau is the doubling threshold
    * (0.0 until the bucket has seen k+1 distinct points). */
  final case class BucketState(
      centerIds: Seq[Long],
      centers: Seq[Seq[Float]],
      tau: Double,
      nSeen: Long
  )

  final case class CoresetSnapshot(
      bucket: Int,
      n_seen: Long,
      n_centers: Int,
      tau: Double,
      center_ids: Seq[Long]
  )

  /** Euclidean distance, index-order Double accumulation (the same
    * op-order discipline as graft_dist2, so batch/stream/spec all
    * compare bit-identical doubles). */
  private[graft] def dist(a: Seq[Float], b: Seq[Float]): Double = {
    // fail on dimension drift rather than silently comparing a prefix: a
    // truncated arrival could be spuriously "covered" (or seat a center
    // with a wrong τ), invalidating the certified coverage radius
    require(
      a.length == b.length,
      s"coreset dist: dimension mismatch ${a.length} vs ${b.length}"
    )
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  private def minDist(p: Seq[Float], centers: Seq[Seq[Float]]): Double =
    if (centers.isEmpty) Double.PositiveInfinity
    else centers.iterator.map(dist(p, _)).min

  /** Greedy keep in arrival order: a center survives iff it is > 2τ
    * from every earlier-kept center. Always drops at least one center
    * when called right after τ is (re)set to half the min pairwise
    * distance, because the closest pair sits at exactly 2τ. */
  private def mergeCenters(
      ids: Seq[Long],
      cs: Seq[Seq[Float]],
      tau: Double
  ): (Seq[Long], Seq[Seq[Float]]) = {
    val keptIds = Vector.newBuilder[Long]
    val kept = scala.collection.mutable.ArrayBuffer.empty[Seq[Float]]
    ids.indices.foreach { i =>
      if (kept.forall(c => dist(cs(i), c) > 2 * tau)) {
        keptIds += ids(i)
        kept += cs(i)
      }
    }
    (keptIds.result(), kept.toSeq)
  }

  private def minPairwise(cs: Seq[Seq[Float]]): Double =
    (for { i <- cs.indices; j <- (i + 1) until cs.size } yield dist(cs(i), cs(j))).min

  /** Fold one point into a bucket's state — the pure kernel shared by
    * the streaming handler and [[coresetBatch]]. */
  private[streaming] def insert(st: BucketState, id: Long, p: Seq[Float], k: Int): BucketState = {
    val d = minDist(p, st.centers)
    val covered =
      if (st.tau == 0.0) d == 0.0 // init phase: distinct points all become centers
      else d <= 4 * st.tau
    if (covered) st.copy(nSeen = st.nSeen + 1)
    else {
      var ids = st.centerIds :+ id
      var cs = st.centers :+ p
      var tau = st.tau
      while (cs.size > k) {
        tau = if (tau == 0.0) minPairwise(cs) / 2 else tau * 2
        val (i2, c2) = mergeCenters(ids, cs, tau)
        ids = i2
        cs = c2
      }
      BucketState(ids, cs, tau, st.nSeen + 1)
    }
  }

  private val emptyState = BucketState(Vector.empty, Vector.empty, 0.0, 0L)

  /** Batch reference: fold an ALREADY-ORDERED sequence per bucket —
    * the parity oracle for the streaming form, and the offline way to
    * build the same coreset from a static corpus. */
  def coresetBatch(
      points: Seq[CoresetPoint],
      k: Int = 8
  ): Map[Int, BucketState] =
    points
      .sortBy(p => (p.ts.getTime, p.vec_id))
      .foldLeft(Map.empty[Int, BucketState]) { (acc, p) =>
        val st = acc.getOrElse(p.bucket, emptyState)
        acc.updated(p.bucket, insert(st, p.vec_id, p.embedding, k))
      }

  /** The streaming operator: per-bucket doubling state, one snapshot
    * row per touched bucket per micro-batch (Update mode). */
  def coresetSnapshots(
      points: Dataset[CoresetPoint],
      k: Int = 8
  ): Dataset[CoresetSnapshot] = {
    val spark = points.sparkSession
    import spark.implicits._

    def update(
        bucket: Int,
        rows: Iterator[CoresetPoint],
        state: GroupState[BucketState]
    ): Iterator[CoresetSnapshot] = {
      val ordered = rows.toArray.sortBy(p => (p.ts.getTime, p.vec_id))
      var st = state.getOption.getOrElse(emptyState)
      ordered.foreach(p => st = insert(st, p.vec_id, p.embedding, k))
      state.update(st)
      Iterator(
        CoresetSnapshot(bucket, st.nSeen, st.centerIds.size, st.tau, st.centerIds)
      )
    }

    points
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(
        OutputMode.Update,
        GroupStateTimeout.NoTimeout
      )(update)
  }

  /** Composable-coreset merge: greedy farthest-point k-center (v32's
    * algorithm, driver-side — the candidate set is ≤ buckets·k points,
    * kilobytes) over the union of per-bucket centers, seeded at the
    * lowest vec_id, ties on vec_id. Returns the chosen (id, embedding)
    * and the merge radius r_merge = max over CANDIDATES of distance to
    * their nearest chosen center — the second term of the certificate. */
  def mergedCenters(
      buckets: Iterable[BucketState],
      k: Int = 8
  ): (Vector[(Long, Seq[Float])], Double) = {
    val cand = buckets
      .flatMap(b => b.centerIds.zip(b.centers))
      .toVector
      .sortBy(_._1)
      .distinctBy(_._1)
    require(cand.nonEmpty, "no candidate centers: empty coreset")
    var chosen = Vector(cand.head)
    var rest = cand.tail
    while (chosen.size < k && rest.nonEmpty) {
      val far = rest.maxBy(c => (chosen.iterator.map(ch => dist(c._2, ch._2)).min, -c._1))
      chosen = chosen :+ far
      rest = rest.filterNot(_._1 == far._1)
    }
    val rMerge =
      if (rest.isEmpty && cand.size <= k) 0.0
      else cand.iterator.map(c => chosen.iterator.map(ch => dist(c._2, ch._2)).min).max
    (chosen, rMerge)
  }
}
