package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.cdc.TableGroup

/** Streaming transactional multi-table sink: every micro-batch of a
  * changelog stream lands across ALL member tables as ONE
  * [[graft.cdc.TableGroup]] commit — the end-to-end shape of the
  * reference's consumer contract (a transaction's rows span tables; a
  * reader sees them advance together or not at all), driven from a live
  * stream.
  *
  * The group batch id IS the foreachBatch id: Structured Streaming
  * replays a failed batch with the SAME id, and TableGroup's root
  * watermark plus per-member merge guards turn the replay into a
  * convergent retry — members that landed no-op, missing members land,
  * the root swaps once. Exactly-once table state over an at-least-once
  * sink callback, with cross-table atomicity on top (the cdc41/cdc56
  * disciplines composed).
  *
  * `members` maps the incoming batch to each member's changelog rows
  * (filter/project per table — e.g. route upserts by entity, split
  * columns); it runs INSIDE foreachBatch on the bounded batch frame.
  *
  * ORDERED-SOURCE CONTRACT: member folds drop tombstones once applied
  * (latest-state semantics), so batches must arrive in changelog order —
  * what every CDC transport (WAL, Kafka partition, the file source's
  * mtime ordering) provides. A source that can deliver an older batch
  * AFTER a newer one needs tombstone retention in the member fold
  * instead (see [[graft.cdc.LatestState]]'s streaming TTL tombstones).
  */
object GroupCommitStream {

  /** `checkpointLocation` defaults to a deterministic path UNDER the group
    * root (underscore-prefixed, invisible to readers), so a second run()
    * on the same rootDir resumes with MONOTONIC batch ids: a fresh temp
    * checkpoint would restart ids at 0 and TableGroup's persisted root
    * watermark (`lastBatchId >= batchId`) would silently swallow the early
    * batches — data dropped with no error. Callers wanting isolation pass
    * their own path.
    */
  def run(changelog: DataFrame, rootDir: String,
      members: DataFrame => Seq[TableGroup.TableBatch],
      orderCols: Seq[String], numBuckets: Int = 64,
      checkpointLocation: Option[String] = None): Unit = {
    val q = start(changelog, rootDir, members, orderCols, numBuckets,
      checkpointLocation,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
  }

  /** The LONG-RUNNING face: same exactly-once group-commit fold, but the
    * query is returned still running under a continuous processing-time
    * trigger (default: fire as fast as batches arrive) instead of
    * draining-and-terminating — the production deployment shape, where the
    * caller owns lifecycle (`awaitTermination` / `stop` / monitoring).
    * [[run]] is this with `Trigger.AvailableNow` + await, for drains,
    * backfills, and gates.
    */
  def start(changelog: DataFrame, rootDir: String,
      members: DataFrame => Seq[TableGroup.TableBatch],
      orderCols: Seq[String], numBuckets: Int = 64,
      checkpointLocation: Option[String] = None,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = changelog.sparkSession
    // surface a retention misconfiguration when the stream STARTS, not at
    // its first racing conflict (TableGroup.commit would also refuse at the
    // first batch — this fails before any query lifecycle spins up)
    graft.cdc.MaterializedTable.checkStandingFoldRetention(spark, rootDir,
      "GroupCommitStream.start")
    val ckpt = checkpointLocation.getOrElse(s"$rootDir/_graft_checkpoint")
    changelog.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // one cross-table transaction per micro-batch; the batch frame is
        // re-used by every member projection, so cache it — persist (not an
        // eager localCheckpoint) lets the FIRST member merge materialize it
        // as a side effect instead of paying a separate job per batch
        val pinned = batch.persist()
        try {
          // bounded retry on a LOST OPTIMISTIC COMMIT (maintenance racing
          // the stream): the group commit is batch-id idempotent, so the
          // retry converges — the query survives the race instead of dying
          // to an exception its own class documents as retryable. A
          // crashed-writer StaleCommitClaim still kills the query (operator
          // action by design).
          graft.cdc.MaterializedTable.withCommitRetry(spark) {
            TableGroup.commit(spark, rootDir, members(pinned), orderCols,
              batchId = id, numBuckets = numBuckets)
          }
          ()
        } finally pinned.unpersist()
      }
      .option("checkpointLocation", ckpt)
      .trigger(trigger)
      .start()
  }
}
