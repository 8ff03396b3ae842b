package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.VectorIndexStore

/** Streaming IVF index maintenance — the continuous form of
  * [[graft.operators.VectorIndexStore.upsert]]: arriving embedding
  * micro-batches are assigned to the STORED centroids (no refit) and
  * land in a DELTA directory beside the base index — the base+delta
  * serving pattern every large ANN deployment uses. New vectors become
  * searchable within one micro-batch
  * ([[graft.operators.VectorIndexStore.probeWithDelta]] scans base ∪
  * delta, pruning unprobed lists in both); the base is rebuilt only when
  * drift — v20's growth ledger — earns it, and compaction folds the
  * delta in.
  *
  * Replay idempotence comes from the delta's layout, not the writer's
  * luck: partitions are (epoch = micro-batch id, cid) under dynamic
  * partition overwrite, so a checkpoint-replayed batch carries the same
  * epoch and REPLACES its own partitions ([[StreamingSnapshot]]'s
  * truncate-sink argument, applied to appends by making each batch its
  * own partition).
  *
  * Scale shape per batch: one k-row centroid read, the shuffle-free
  * codegen argmin over the arrivals, a write touching only the arrivals'
  * partitions. The resident index is never read or rewritten.
  */
object StreamingIndexUpsert {

  /** Attach the maintenance stream: every arriving micro-batch of
    * (vec_id, embedding) rows is upserted into `deltaDir` under its own
    * epoch. */
  def start(
      arrivals: DataFrame,
      table: String,
      deltaDir: String,
      checkpoint: String
  ): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        VectorIndexStore.writeDelta(batch, table, deltaDir, id)
      }
      .start()
}
