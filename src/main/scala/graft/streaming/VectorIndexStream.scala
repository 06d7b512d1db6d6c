package graft.streaming

import graft.cdc.{LatestState, Op}
import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of a PERSISTED IVF ANN index from a keyed change
  * stream — the production vector-store loop: embeddings arrive as CDC
  * envelopes (insert/update/delete per document id), and the saved index
  * follows WITHOUT rebuilds, composing the frozen-centroid incremental
  * operators ([[graft.operators.IvfIndex.appendSaved]] /
  * [[graft.operators.IvfIndex.removeSaved]]) under Structured Streaming's
  * `foreachBatch`.
  *
  * Why this shape: index writes are filesystem mutations, not a Spark sink —
  * `foreachBatch` is the idiomatic bridge (per micro-batch, a BATCH
  * DataFrame + exactly-once-per-epoch semantics via the checkpoint). Within
  * a batch the changelog first compacts to latest-state-per-key (the
  * LatestState operator, keepDeleted so tombstones survive as removals) —
  * an id updated five times in one batch touches the index once.
  *
  * Idempotence (at-least-once replays, crash-rerun of a half-applied
  * batch): every batch applies as REMOVE-all-batch-ids THEN APPEND-alive —
  * so re-applying any batch (or any suffix union of batches) removes the
  * rows it previously appended and appends identical ones; the index state
  * is a pure function of the latest event per key, and replays are silent
  * (spec-pinned). Update semantics fall out for free: the stale vector is
  * removed, the new one assigned to its (frozen-centroid) cell.
  *
  * Scale: per batch, cost is O(batch) assignment work + partition-pruned
  * rewrites of ONLY the cells holding touched ids (removeSaved's dynamic
  * partition overwrite, appendSaved's touched-partition append) — the
  * standing corpus is never rescanned. Same drift caveat as all
  * frozen-quantizer ingest: monitor cell balance, retrain offline when it
  * skews.
  */
object VectorIndexStream {

  /** The two filesystem mutations a maintained index kind must provide —
    * both index families ship frozen-quantizer incremental ops with the
    * same shape, so the maintenance loop is index-kind-agnostic.
    */
  final case class IndexOps(
      remove: (org.apache.spark.sql.SparkSession, String, DataFrame, String) => Unit,
      append: (org.apache.spark.sql.SparkSession, String, DataFrame, String, String) => Unit)

  /** IVF-Flat ([[graft.operators.IvfIndex]]) saved-index operations. */
  val IvfFlatOps: IndexOps = IndexOps(
    (s, dir, ids, idCol) => { IvfIndex.removeSaved(s, dir, ids, idCol); () },
    (s, dir, docs, idCol, vecCol) => {
      IvfIndex.appendSaved(s, dir, docs, idCol, vecCol); () })

  /** IVF-PQ ([[graft.operators.PqIndex.IvfPq]]) saved-index operations. */
  val IvfPqOps: IndexOps = IndexOps(
    (s, dir, ids, idCol) => {
      graft.operators.PqIndex.removeSavedIvf(s, dir, ids, idCol); () },
    (s, dir, docs, idCol, vecCol) => {
      graft.operators.PqIndex.appendSavedIvf(s, dir, docs, idCol, vecCol); () })

  /** Apply one changelog micro-batch to the saved index at `dir`.
    * Exposed for replay/crash-rerun reasoning and direct batch use.
    */
  def applyBatch(batch: DataFrame, dir: String, idCol: String,
      vecCol: String, orderCols: Seq[String], opCol: String = "op",
      ops: IndexOps = IvfFlatOps): Unit = {
    val spark = batch.sparkSession
    // one index touch per key: latest event wins inside the batch; bounded
    // localCheckpoint (≤ one row per batch key, consumed by both phases)
    val latest = LatestState.batch(batch, Seq(idCol), orderCols, opCol,
      keepDeleted = true).localCheckpoint()
    ops.remove(spark, dir, latest.select(col(idCol)), idCol)
    val alive = latest.filter(col(opCol) =!= Op.Delete)
    if (!alive.isEmpty) ops.append(spark, dir, alive, idCol, vecCol)
  }

  /** Run the maintenance loop over a streaming changelog. The checkpoint
    * makes delivery effectively-once per epoch; [[applyBatch]]'s
    * remove-then-append makes the occasional replayed epoch harmless.
    */
  def maintain(changes: DataFrame, dir: String, idCol: String,
      vecCol: String, orderCols: Seq[String], checkpoint: String,
      opCol: String = "op",
      trigger: Trigger = Trigger.AvailableNow(),
      ops: IndexOps = IvfFlatOps): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        applyBatch(b.toDF(), dir, idCol, vecCol, orderCols, opCol, ops)
      }
      .trigger(trigger)
      .start()
}
