package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{TextOps, VectorOps}
import graft.multimodal.MultimodalOps

/** Streaming EMBEDDING-grain decontamination: a document stream screened
  * against a static eval set in trigram-embedding space — t75's contract
  * made continuous, and the paraphrase-grade sibling of
  * [[StreamingDecontaminate]]'s n-gram screen (that one catches literal
  * overlap as docs arrive; this one catches the reworded leak whose
  * shingles differ but whose embedding direction survives).
  *
  * The verdict is stateless per document — it depends on the doc and the
  * FROZEN eval index alone — so the form is `foreachBatch` running the
  * identical batch plan ([[TextOps.embedScreenVerdicts]], shared
  * verbatim with t75) per micro-batch: no state store, no watermark,
  * nothing to replay wrong. The fit-once contract is the scale point:
  * eval embeddings AND band rows are built once here, cached and
  * closure-captured (benchmark-sized by contract — the broadcast side),
  * so a micro-batch pays only its own featurize + band hashing + one
  * broadcast-join probe, never an eval-side rebuild.
  *
  * Band geometry is solved at FIT time from the reference corpus count
  * (m7b's auto-solve) and frozen into the index: arrivals must probe
  * under the geometry the index was banded with — the same pinned-
  * geometry contract as [[StreamingSemanticDedup]]'s persisted index.
  *
  * OWNERSHIP: the caller owns the returned index's caches; call
  * [[release]] after the stream consuming it stops (the
  * [[StreamingSuffixProbe.releaseIndex]] discipline).
  */
object StreamingEmbedDecontaminate {

  /** The fitted eval side: cached band rows + embeddings and the frozen
    * geometry they were banded under. */
  final case class EvalIndex(
      evBands: DataFrame,
      evVecs: DataFrame,
      nBands: Int,
      bandBits: Int
  )

  /** Build the eval index once. `corpusN` is the served corpus's vector
    * count — the geometry input (the solver sizes bands for the
    * TRAINING side's collision economics, not the eval side's). */
  def fitEval(s: SparkSession, evalDocs: DataFrame, corpusN: Long): EvalIndex = {
    graft.functions.GraftFunctions.register(s)
    val ev = MultimodalOps
      .gramEmbedFrame(
        evalDocs.filter(length(col("text")) > 0),
        col("doc_id"),
        col("text")
      )
      .cache()
    val (nBands, bandBits) =
      VectorOps.bandGeometry(corpusN, tau = 0.85, targetCandPerVec = 256, maxMiss = 1e-6)
    EvalIndex(
      MultimodalOps
        .bandRows(ev, nBands, bandBits)
        .select(col("vec_id").as("eval_id"), col("band"), col("bh"))
        .cache(),
      ev.select(col("vec_id").as("eval_id"), col("embedding").as("ee"), col("nrm").as("en"))
        .cache(),
      nBands,
      bandBits
    )
  }

  /** The per-batch plan — exactly t75's screen on this batch of
    * (doc_id, text) rows: featurize, band under the index's frozen
    * geometry, broadcast-probe, exact cosine verify at τ=0.8. */
  def screenBatch(batch: DataFrame, idx: EvalIndex): DataFrame =
    TextOps.embedScreenVerdicts(
      MultimodalOps.gramEmbedFrame(
        batch.filter(length(col("text")) > 0),
        col("doc_id"),
        col("text")
      ),
      idx.evBands,
      idx.evVecs,
      idx.nBands,
      idx.bandBits
    )

  /** Release a [[fitEval]] index after its stream has stopped. */
  def release(idx: EvalIndex): Unit = {
    idx.evBands.unpersist(blocking = true)
    idx.evVecs.unpersist(blocking = true)
  }

  /** Wire a (doc_id, text) stream through the screen; `onBatch` receives
    * each micro-batch's per-doc contamination rows (doc_id, n_eval_hits,
    * top_eval_id, max_cos). `checkpoint`: None = ephemeral (tests); pass
    * Some(dir) in production or a restart re-reads the source from
    * offset zero and double-delivers every verdict row. */
  def run(
      docs: DataFrame,
      idx: EvalIndex,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None
  ): StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onBatch(screenBatch(batch, idx), id)
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
