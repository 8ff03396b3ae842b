package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the stateful form of the batch
  * `e22_last_touch` rollup: every purchase is credited the moment it
  * arrives, against O(1) per-user state holding the latest non-purchase
  * touch (type + its event-time micros). A purchase within the 30-minute
  * lookback of that touch attributes to its type; otherwise 'direct'.
  * No timers: attribution is decidable at arrival time, so the state
  * machine is pure carry — the cheapest stateful shape there is.
  *
  * Emits per-purchase attribution ROWS (the ledger's event log, same
  * convention as [[StreamingGrowthAccounting]]); the |types|-row revenue
  * rollup is a trivial downstream agg, and the parity spec aggregates
  * the batch-mode rows and matches `e22_last_touch` bit-for-bit.
  *
  * Ordering caveat (the [[StreamingScdIntervals]] contract): rows sort by
  * event time within each micro-batch, so cross-batch out-of-order
  * arrivals inside the watermark can attribute against a newer touch
  * than a global sort would give; past-watermark rows are dropped and
  * counted before the operator.
  */
object StreamingLastTouch {

  final case class TouchEvent(
      user_id: Long,
      event_id: Long,
      event_type: String,
      ts: Timestamp,
      value: Double
  )

  final case class TouchState(tpe: String, us: Long)

  final case class Attribution(
      user_id: Long,
      event_id: Long,
      us: Long,
      touch: String,
      value_f4: Long
  )

  private final val LookbackUs = 1800L * 1000000

  def attributions(
      events: Dataset[TouchEvent],
      watermark: String = "1 hour"
  ): Dataset[Attribution] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val withWm =
      if (streaming) events.withWatermark("ts", watermark) else events

    def update(
        userId: Long,
        rows: Iterator[TouchEvent],
        state: GroupState[TouchState]
    ): Iterator[Attribution] = {
      val sorted = rows
        .map(e =>
          (
            EventTime.micros(e.ts),
            e.event_id,
            e.event_type,
            // HALF_UP, matching F.fixed4 / SQL round — math.round is
            // half-toward-positive-infinity and diverges on negative
            // half-values (refunds)
            java.math.BigDecimal
              .valueOf(e.value * 10000)
              .setScale(0, java.math.RoundingMode.HALF_UP)
              .longValue()
          )
        )
        .toArray
        .sortBy(t => (t._1, t._2))
      val out = Seq.newBuilder[Attribution]
      var touch = state.getOption.orNull
      sorted.foreach { case (us, eventId, tpe, valueF4) =>
        if (tpe != "purchase") touch = TouchState(tpe, us)
        else {
          val label =
            if (touch != null && us >= touch.us && us - touch.us <= LookbackUs) touch.tpe
            else "direct"
          out += Attribution(userId, eventId, us, label, valueF4)
        }
      }
      if (touch != null) state.update(touch)
      out.result().iterator
    }

    withWm
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append,
        // EventTimeTimeout with NO timers registered: the module needs no
        // timeout, but Spark applies the late-row watermark filter inside
        // flatMapGroupsWithState ONLY under EventTimeTimeout (verified in
        // the 4.1.2 source) — under NoTimeout a past-watermark arrival
        // would reach update() and silently mutate emitted history, where
        // the documented contract (and the late-data spec) says it is
        // dropped and counted in numRowsDroppedByWatermark before the
        // operator. No setTimeoutTimestamp call anywhere => no timer ever
        // fires; batch mode is unaffected (ScdIntervals' precedent).
        GroupStateTimeout.EventTimeTimeout
      )(update)
  }
}
