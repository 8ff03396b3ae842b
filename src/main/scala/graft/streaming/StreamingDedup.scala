package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming form of the batch t3
  * operator (`TextOps.t3DedupExact`), for ingest pipelines that must not
  * admit the same document twice.
  *
  * State story (the part that matters at scale): a plain streaming
  * `dropDuplicates` keeps every key ever seen — unbounded state on an
  * unbounded stream. `dropDuplicatesWithinWatermark` evicts fingerprints
  * once the event-time watermark passes them, so state is bounded by the
  * watermark horizon x ingest rate, at the documented cost that a
  * duplicate arriving later than the watermark delay is admitted again
  * (the same trade the reference's weekly re-run backfill model makes:
  * late data is handled by re-running the window, not by infinite state).
  *
  * Dedup key is the md5 content fingerprint, computed in-plan — the exact
  * same key the batch operator shuffles on.
  */
object StreamingDedup {

  /** expects columns (doc_id, ts, text); emits the first-seen row per
    * content fingerprint within the watermark horizon. */
  def dedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
}
