package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TextOps

/** Streaming distribution-drift monitor: each arriving document batch is
  * graded against a STATIC reference distribution (t56's total-variation
  * contract made continuous — the per-ingest quality gate that catches a
  * feed going boilerplate-heavy the batch it happens, not at the next
  * full-corpus profile).
  *
  * Drift of a batch depends on that batch and the reference alone — no
  * cross-batch state — so like [[StreamingDecontaminate]] the right
  * streaming form is `foreachBatch` running the IDENTICAL batch plan
  * (the factored [[TextOps.qualityBinned]] + [[TextOps.tvPerLang]]) per
  * micro-batch. No state store, no watermark, nothing to replay wrong:
  * a checkpoint-replayed batch recomputes the same deterministic rows
  * under the same batch id.
  *
  * The fit-once contract is the scale point: the reference histogram is
  * aggregated ONCE from the existing corpus (≤101 bins per language —
  * kilobytes however large the corpus) and closure-captured; a
  * micro-batch pays only its own per-row binning plus a bounded
  * histogram merge. TV stays in exact integers end-to-end (t56's
  * cross-multiplication), so monitor rows are reproducible across
  * replays and engines.
  */
object StreamingDriftMonitor {

  /** Aggregate the reference (lang, bin, n_a) histogram once; cached —
    * the corpus is never rescanned per batch. */
  def fitReference(corpus: DataFrame): DataFrame =
    TextOps
      .qualityBinned(corpus)
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_a"))
      .cache()

  /** The per-batch plan — exactly t56's TV math with the reference as
    * the prior side and this batch as the current side. */
  def driftBatch(batch: DataFrame, reference: DataFrame): DataFrame =
    TextOps.tvPerLang(
      reference,
      TextOps
        .qualityBinned(batch)
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_b"))
    )

  /** Wire a (doc_id, text, lang) stream through the monitor; `onBatch`
    * receives each micro-batch's per-language drift rows
    * (lang, n_prior, n_current, n_bins, tv6) — an alerting sink in
    * production, a memory table in tests. */
  /** `checkpoint`: None = ephemeral (tests, ad-hoc audits); pass
    * Some(dir) in production so a restart resumes from the committed
    * offset instead of re-reading the source from zero and re-emitting
    * every batch's drift rows (round-10 review). */
  def run(
      docs: DataFrame,
      reference: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None
  ): StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onBatch(driftBatch(batch, reference), id)
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
