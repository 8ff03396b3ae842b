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
  * Every entry is eventually RETIRED, so long-running state is bounded by
  * in-horizon users, not all-time signups: once the watermark passes
  * signupUs + horizon, no future purchase can qualify, and the entry —
  * unconverted slot or converted tombstone — is removed by its timer.
  * Caveat of retirement: a user who signs up AGAIN after their horizon
  * expired re-enters the funnel as a fresh signup (a second "signup"
  * row), where a single batch pass would anchor at the global minimum;
  * for a >7-day-late re-signup this is the operational reading.
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
        // watermark passed every buffered purchase: prune. An entry with
        // nothing left that can ever emit again is REMOVED — that is
        // signup-less empties, and (once the watermark passes
        // signupUs + horizon) signed-up entries too, converted or not: no
        // future in-watermark purchase can qualify (it would be beyond the
        // horizon on sight), so both the unconverted buffer slot and the
        // converted tombstone are dead weight. Without this, every
        // one-time signup would leave a permanent state-store entry.
        val st = state.get
        val kept = st.pending.filter(_ >= wmUs)
        val horizonPassed = st.signupUs >= 0 && wmUs > st.signupUs + HorizonUs
        if (kept.isEmpty && (st.signupUs < 0 || horizonPassed)) state.remove()
        else {
          state.update(st.copy(pending = kept))
          armTimer(state, st.signupUs, kept)
        }
        Iterator.empty
      } else {
        val sorted = rows
          .map(e => (EventTime.micros(e.ts), e.event_id, e.event_type))
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
          if (streaming) armTimer(state, st.signupUs, st.pending)
        }
        out.result().iterator
      }
    }

    /** Every retained state entry carries a timer that eventually retires
      * it: buffered purchases fire when the watermark passes the newest
      * one; a signed-up entry with nothing buffered (unconverted slot or
      * converted tombstone) fires once the watermark passes
      * signupUs + horizon, after which no purchase can ever qualify.
      * Clamped above the current watermark — a timer in the past is an
      * error, and re-arming can race a watermark that already passed the
      * horizon. */
    def armTimer(
        state: GroupState[FunnelState],
        signupUs: Long,
        pending: List[Long]
    ): Unit =
      if (pending.nonEmpty)
        state.setTimeoutTimestamp(pending.max / 1000 + 1)
      else if (signupUs >= 0)
        state.setTimeoutTimestamp(
          math.max((signupUs + HorizonUs) / 1000 + 1, state.getCurrentWatermarkMs() + 1)
        )

    withWm
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      )(update)
  }
}
