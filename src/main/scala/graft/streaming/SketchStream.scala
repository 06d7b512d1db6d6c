package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** STREAMING SKETCH MAINTENANCE — per-group HLL sketches kept current from
  * a stream, the production "live distinct-counts dashboard" loop: each
  * micro-batch sketches ONLY its own rows (`hll_sketch_agg`), then unions
  * into a standing (group, sketch) parquet table (`hll_union_agg`).
  * Mergeability is the whole point — q55 proved sketch re-aggregation over
  * a time hierarchy in batch; this is the same algebra pumped by a stream:
  * the standing table never re-reads history, each batch pays O(batch) +
  * O(groups), and any consumer reads a KB-sized table for an
  * any-window-so-far distinct estimate.
  *
  * Retry safety comes FREE from sketch algebra: HLL registers are a set
  * union, so folding the same batch twice is a no-op (unlike counts, which
  * need cdc14's batch-id markers). Spec-pinned.
  *
  * The standing table is tiny (O(groups) rows) by construction, so the
  * read-union-rewrite per batch is the right shape; a huge group space
  * would bucket it through MaterializedTable's merge instead.
  */
object SketchStream {

  /** Drive `stream` to completion (AvailableNow), folding per-`groupCol`
    * HLL sketches of `valueCol` into `tableDir`.
    */
  def foldSketches(stream: DataFrame, groupCol: String, valueCol: String,
      tableDir: String, checkpointLocation: Option[String] = None): Unit = {
    // sketch union is replay-idempotent, so a fresh checkpoint is CORRECT
    // here — but a deterministic one means a second run() folds only NEW
    // files instead of re-reading the whole source. SIBLING of tableDir
    // (like the .tmp swap dir), never inside: foldOnce overwrites the
    // standing dir wholesale each batch
    val ckpt = checkpointLocation.getOrElse(s"$tableDir._graft_checkpoint")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        foldOnce(batch, groupCol, valueCol, tableDir)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One fold step (exposed for the retry-idempotence spec): sketch the
    * batch, union into the standing table via a tmp-dir swap (the standing
    * dir cannot be lazily read and overwritten in one action).
    */
  def foldOnce(batch: DataFrame, groupCol: String, valueCol: String,
      tableDir: String): Unit = {
    val spark = batch.sparkSession
    val b = batch.groupBy(col(groupCol))
      .agg(expr(s"hll_sketch_agg($valueCol)").as("sk"))
    val existing = {
      // exists-check, not a catch-all: a transient read failure must
      // surface — swallowing it would silently reset the accumulated
      // sketch state to this batch alone
      val p = new org.apache.hadoop.fs.Path(tableDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) Some(spark.read.parquet(tableDir)) else None
    }
    val merged = existing match {
      case None => b
      case Some(e) => e.unionByName(b).groupBy(col(groupCol))
        .agg(expr("hll_union_agg(sk)").as("sk"))
    }
    val tmp = s"$tableDir.tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    batch.sparkSession.read.parquet(tmp)
      .write.mode("overwrite").parquet(tableDir)
  }

  /** Read the standing table's estimates: (group, estimate). */
  def estimates(spark: org.apache.spark.sql.SparkSession, tableDir: String,
      groupCol: String): DataFrame =
    spark.read.parquet(tableDir)
      .select(col(groupCol), expr("hll_sketch_estimate(sk)").as("estimate"))
}
