package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Watermarked stream-stream interval join — attribution between two live
  * event streams (the streaming counterpart of the batch e4/e9 funnel
  * logic): each signup matches the purchases of the same user that occur
  * within `[signup_ts, signup_ts + horizon]`.
  *
  * Both sides carry a watermark and the join predicate carries the event-
  * time interval — together they BOUND the join state: Spark can evict a
  * buffered signup once the watermark passes `signup_ts + horizon`, and a
  * buffered purchase once no future signup could reach back to it. Without
  * the interval the state grows with the full stream history and append
  * mode is rejected outright; this shape is the only stream-stream join
  * that runs forever at ingest scale.
  *
  * Inner join by design: an unmatched signup is not a result, it is the
  * absence of one (the conversion-rate denominator lives in the batch
  * operators). The same call works on batch frames (watermarks no-op), so
  * batch/stream parity is testable directly.
  */
object StreamJoin {

  def attributePurchases(
      signups: DataFrame,
      purchases: DataFrame,
      watermark: String = "1 hour",
      horizon: String = "7 days"
  ): DataFrame = {
    val s =
      if (signups.isStreaming) signups.withWatermark("signup_ts", watermark)
      else signups
    val p =
      if (purchases.isStreaming) purchases.withWatermark("purchase_ts", watermark)
      else purchases
    s.join(
      p,
      expr(
        s"""user_id = p_user_id AND
            purchase_ts >= signup_ts AND
            purchase_ts <= signup_ts + interval $horizon"""
      )
    ).select("user_id", "signup_ts", "purchase_ts", "amount")
  }
}
