package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming growth accounting — the stateful form of the batch
  * `e21_growth_accounting` ledger: every (event_type, user) keeps O(1)
  * state (last active week + whether its churn was already emitted) and
  * the operator emits LEDGER CONTRIBUTIONS (`new` / `retained` /
  * `resurrected` / `churned`) the moment they are provable:
  *
  *  - `new` / `retained` / `resurrected` on the user's first event of a
  *    week, classified against the stored last-active week;
  *  - `churned` at week w+7 either when a LATER arrival proves the gap
  *    (same rule as batch e21's `nxt - week > 7`), or when the
  *    event-time TIMER passes the end of week w+7 with no activity —
  *    the streaming analogue of e21's horizon censoring: churn is never
  *    declared for a week the watermark hasn't fully retired.
  *
  * State never expires (after a churn fires the entry stays, flagged, so
  * a returning user classifies as `resurrected`, not `new`) — growth
  * accounting fundamentally needs lifetime memory per (type, user); the
  * state IS the user dimension, constant bytes per row, exactly what a
  * production job keys into a state store. The weekly ledger is a
  * trivial rollup of the emitted contributions; the parity spec
  * aggregates them and matches e21's counts bit-for-bit.
  *
  * Ordering caveat (same contract as [[StreamingScdIntervals]]): arrivals
  * are event-time-sorted within each micro-batch; an in-watermark late
  * event from a week OLDER than the stored last week cannot rewrite
  * already-emitted classes — it only back-fills activity, emitting
  * nothing. Past-watermark rows never reach the operator.
  */
object StreamingGrowthAccounting {

  final case class GaEvent(event_type: String, user_id: Long, ts: Timestamp)

  /** lastWeekDays: Monday of the last active week, in epoch days.
    * churned: that week's churn contribution was already emitted. */
  final case class GaState(lastWeekDays: Int, churned: Boolean)

  final case class GaOut(event_type: String, user_id: Long, week_days: Int, cls: String)

  private final val WeekUs = 7L * 86400 * 1000000
  private final val DayMs = 86400L * 1000

  /** Monday-of-week in epoch days for an event-time micros value
    * (1970-01-01 was a Thursday ⇒ offset-to-Monday = (days+3) mod 7). */
  private[streaming] def weekDays(us: Long): Int = {
    val days = Math.floorDiv(us, 86400L * 1000000).toInt
    days - Math.floorMod(days + 3, 7)
  }

  def growthContributions(
      events: Dataset[GaEvent],
      watermark: String = "1 hour",
      maxWeekDays: Option[Int] = None
  ): Dataset[GaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val withWm =
      if (streaming) events.withWatermark("ts", watermark) else events

    def update(
        key: (String, Long),
        rows: Iterator[GaEvent],
        state: GroupState[GaState]
    ): Iterator[GaOut] = {
      val (tpe, userId) = key
      if (state.hasTimedOut) {
        // the watermark retired week last+7 without activity — churn is
        // now a fact; the entry stays for future resurrection checks
        val s = state.get
        state.update(GaState(s.lastWeekDays, churned = true))
        if (s.churned) Iterator.empty
        else Iterator(GaOut(tpe, userId, s.lastWeekDays + 7, "churned"))
      } else {
        val weeks = rows
          .map(e => weekDays(EventTime.micros(e.ts)))
          .toArray
          .distinct
          .sorted
        val out = Seq.newBuilder[GaOut]
        var st = state.getOption.orNull
        weeks.foreach { w =>
          st match {
            case null =>
              out += GaOut(tpe, userId, w, "new")
              st = GaState(w, churned = false)
            case s if w <= s.lastWeekDays => // back-fill inside known history: no class change
            case s if w == s.lastWeekDays + 7 =>
              out += GaOut(tpe, userId, w, "retained")
              st = GaState(w, churned = false)
            case s =>
              // the gap itself proves the churn if the timer hasn't yet
              if (!s.churned) out += GaOut(tpe, userId, s.lastWeekDays + 7, "churned")
              out += GaOut(tpe, userId, w, "resurrected")
              st = GaState(w, churned = false)
          }
        }
        if (st != null) {
          if (streaming) {
            state.update(st)
            if (!st.churned)
              // fires once the watermark passes the END of week last+7
              state.setTimeoutTimestamp((st.lastWeekDays + 14L) * DayMs)
          } else {
            // batch horizon censoring — e21's `week + 7 <= maxw` verbatim
            maxWeekDays.foreach { maxw =>
              if (!st.churned && st.lastWeekDays + 7 <= maxw)
                out += GaOut(tpe, userId, st.lastWeekDays + 7, "churned")
            }
          }
        }
        out.result().iterator
      }
    }

    withWm
      .groupByKey(e => (e.event_type, e.user_id))
      .flatMapGroupsWithState(
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      )(update)
  }
}
