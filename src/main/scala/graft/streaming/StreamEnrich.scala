package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Stateless stream-static enrichment — the dimension-lookup step of a
  * streaming ingest path (events arrive unbounded; the dimension table is
  * small and slowly changing, re-read per restart).
  *
  * A stream-static join keeps NO state: every micro-batch joins against
  * the static side as-of plan time, so this composes with watermarked
  * aggregations downstream without growing their state. The static side is
  * broadcast EXPLICITLY — a fresh static DataFrame has unknown stats, and
  * at scale letting it sort-merge would reshuffle every micro-batch of the
  * stream (the same pitfall the batch post-agg joins document).
  *
  * Left join preserves events with no dimension row (they enrich to NULL
  * and stay in the stream for downstream dead-lettering) — dropping them
  * silently is the classic enrichment bug.
  */
object StreamEnrich {

  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")
}
