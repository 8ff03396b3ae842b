package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the stateful form of the batch
  * `e4_funnel` aggregate: one "signup" row per user at their first
  * observed signup, one "converted" row the moment a purchase inside
  * the 7-day post-signup horizon becomes known. The batch rollup
  * (count signups, count conversions, divide) is a trivial downstream
  * agg, and the parity spec matches it against `e4_funnel` bit-for-bit.
  *
  * The interesting state problem is ORDER: e4's predicate anchors at the
  * MINIMUM signup time, so a purchase can become qualifying retroactively
  * when an earlier signup arrives after it (cross-batch, in-watermark).
  * The state machine therefore buffers not-yet-qualifying purchases and
  * re-checks them whenever the known signup minimum moves. The buffer is
  * provably bounded by the watermark: a future signup must carry an
  * event time ≥ the current watermark, so a buffered purchase at time p
  * can never qualify once the watermark passes p (any future signup s'
  * has s' > p, and qualification needs s' ≤ p) — it is pruned, and an
  * event-time timer forces the prune even for users that never appear
  * again. Purchases later than knownSignup+horizon are dropped on sight:
  * the signup minimum only DECREASES, which moves the window earlier,
  * never later. Once converted, state collapses to a 17-byte tombstone.
  *
  * Ordering caveat (the [[StreamingScdIntervals]] contract): the
  * "converted" row's `us` is the earliest qualifying purchase KNOWN at
  * emission time under stream order; a batch run (one sorted pass)
  * emits the global earliest. Past-watermark rows are dropped and
  * counted in numRowsDroppedByWatermark before the operator.
  */
object StreamingFunnel {

  final case class FunnelEvent(
      user_id: Long,
      event_id: Long,
      event_type: String,
      ts: Timestamp
  )

  /** signupUs = -1 until a signup is seen; pending = buffered purchase
    * times, all < signupUs (or unanchored), all ≥ the watermark. */
  final case class FunnelState(
      signupUs: Long,
      converted: Boolean,
      pending: List[Long]
  )

  final case class FunnelOut(user_id: Long, us: Long, kind: String)

  private final val HorizonUs = 7L * 24 * 3600 * 1000000

  def transitions(
      events: Dataset[FunnelEvent],
      watermark: String = "1 hour"
  ): Dataset[FunnelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    // only the two funnel stages reach the stateful shuffle (untyped
    // column filter — stays in codegen, prunes before the exchange)
    val relevant =
      events.filter(org.apache.spark.sql.functions.col("event_type").isin("signup", "purchase"))
    val withWm =
      if (streaming) relevant.withWatermark("ts", watermark) else relevant

    def update(
        userId: Long,
        rows: Iterator[FunnelEvent],
        state: GroupState[FunnelState]
    ): Iterator[FunnelOut] = {
      val wmUs =
        if (streaming) state.getCurrentWatermarkMs() * 1000 else Long.MinValue
      if (state.hasTimedOut) {
        // watermark passed every buffered purchase: prune; an empty,
        // signup-less entry can never emit again — remove it
        val st = state.get
        val kept = st.pending.filter(_ >= wmUs)
        if (st.signupUs < 0 && kept.isEmpty) state.remove()
        else state.update(st.copy(pending = kept))
        Iterator.empty
      } else {
        val sorted = rows
          .map(e => (e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000, e.event_id, e.event_type))
          .toArray
          .sortBy(t => (t._1, t._2))
        val out = Seq.newBuilder[FunnelOut]
        var st = state.getOption.getOrElse(FunnelState(-1L, converted = false, Nil))
        sorted.foreach { case (us, _, tpe) =>
          tpe match {
            case "signup" =>
              if (st.signupUs < 0) {
                out += FunnelOut(userId, us, "signup")
                st = st.copy(signupUs = us)
              } else if (us < st.signupUs) {
                // the anchor is MIN(signup) — no new emission, but the
                // earlier anchor may retro-qualify buffered purchases
                st = st.copy(signupUs = us)
              }
            case "purchase" if !st.converted =>
              // beyond any reachable window (the anchor only decreases)
              val hopeless = st.signupUs >= 0 && us > st.signupUs + HorizonUs
              if (!hopeless) st = st.copy(pending = us :: st.pending)
            case _ => ()
          }
        }
        if (!st.converted && st.signupUs >= 0) {
          val qualifying =
            st.pending.filter(p => p >= st.signupUs && p - st.signupUs <= HorizonUs)
          if (qualifying.nonEmpty) {
            out += FunnelOut(userId, qualifying.min, "converted")
            st = st.copy(converted = true, pending = Nil)
          }
        }
        if (st.converted) st = st.copy(pending = Nil)
        // a buffered purchase the watermark has passed can never be
        // reached by a future (≥ watermark) signup anchor
        st = st.copy(pending = st.pending.filter(_ >= wmUs))
        if (st.signupUs < 0 && !st.converted && st.pending.isEmpty) {
          // nothing observable can ever come of this entry — never
          // materialize state for users who only browse
          if (state.exists) state.remove()
        } else {
          state.update(st)
          if (streaming && st.pending.nonEmpty)
            // fire once the watermark retires the newest buffered purchase
            state.setTimeoutTimestamp(st.pending.max / 1000 + 1)
        }
        out.result().iterator
      }
    }

    withWm
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      )(update)
  }
}
