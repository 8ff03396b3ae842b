package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TextOps

/** Streaming ExactSubstr probe: a document stream screened at 16-token-
  * window grain against the PERSISTED suffix gram index (t72's contract
  * made continuous — the last rung of the streaming dedup ladder after
  * StreamingDedup at exact grain and StreamingMinhashDedup at near-dup
  * grain). Each arriving doc reports how many of its windows the served
  * corpus already contains.
  *
  * The verdict is stateless per document — it depends on the doc and the
  * FROZEN index alone — so the right form is `foreachBatch` running the
  * identical batch plan ([[TextOps.suffixProbeVerdicts]], shared verbatim
  * with t72) per micro-batch: no state store, no watermark, nothing to
  * replay wrong (the StreamingDecontaminate / StreamingDriftMonitor
  * discipline). The index is built ONCE per ingest from the persisted
  * rank table ([[TextOps.suffixGramIndexOn]] — a store read after the
  * first session) and closure-captured; a micro-batch pays only its own
  * window hashing plus one hash-keyed join. Arrivals accumulate against
  * the frozen index between ingests; the next full ingest folds them in
  * by rebuilding the rank store (t41's rebuild schedule, adjudicated in
  * SCALING.md round 13).
  */
object StreamingSuffixProbe {

  /** Build (or read back) the served corpus's gram index once. Cached:
    * every micro-batch joins against it, and the store read is one
    * parquet scan that should not repeat per batch.
    *
    * OWNERSHIP: the caller owns the returned cache. A long-lived service
    * that refits per ingest (the documented rebuild schedule) must
    * [[releaseIndex]] the PREVIOUS index once its probe stream is
    * stopped, or each refit strands one cached index for the life of
    * the session (round-13 advice #3). The fit→swap→release sequence:
    * stop the stream on the old index, `fitIndex` the new corpus,
    * restart, then release the old handle. */
  def fitIndex(
      s: SparkSession,
      corpusWords: DataFrame,
      cacheTag: String,
      L: Int = 16
  ): DataFrame =
    TextOps.suffixGramIndexOn(s, corpusWords, cacheTag, L).cache()

  /** Release a [[fitIndex]] handle after the stream consuming it has
    * stopped. Blocking unpersist: the next ingest's fit follows, and a
    * lazy release racing it would briefly double the cache footprint —
    * exactly the accumulation this verb exists to prevent. */
  def releaseIndex(idx: DataFrame): Unit = idx.unpersist(blocking = true)

  /** The per-batch plan — exactly t72's probe stage on this batch of
    * (doc_id, text) rows. */
  def probeBatch(batch: DataFrame, idx: DataFrame, L: Int = 16): DataFrame =
    TextOps.suffixProbeVerdicts(
      batch.select(col("doc_id"), graft.functions.F.wsTokens(col("text")).as("w")),
      idx,
      L
    )

  /** Wire a (doc_id, text) stream through the probe; `onBatch` receives
    * each micro-batch's per-doc verdict rows (doc_id, n_tokens, n_full,
    * n_hit, hit_pct10k). `checkpoint`: None = ephemeral (tests); pass
    * Some(dir) in production or a restart re-reads the source from
    * offset zero and double-delivers every verdict row. */
  def run(
      docs: DataFrame,
      idx: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      L: Int = 16,
      checkpoint: Option[String] = None
  ): StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onBatch(probeBatch(batch, idx, L), id)
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
