package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.MaterializedTable

/** Streaming enrichment against a [[graft.cdc.MaterializedTable]] dimension
  * with STORAGE-PRUNED per-batch reads — the serving-path lookup join.
  *
  * The classic stream-enrichment shapes both fail at 100 TB dimensions:
  * broadcasting the dimension per batch is O(dim) network every trigger,
  * and a shuffle join re-reads the full dimension per trigger. This
  * operator reads, per micro-batch, ONLY the buckets the batch's probe
  * keys hash to ([[MaterializedTable.readMatching]]): a batch touching k
  * keys costs O(k/numBuckets · dimSize) IO — the KTable/lookup-join
  * semantics (the reference's consumers enrich against exactly such a
  * compacted-topic materialization) on plain parquet.
  *
  * Batch-retry idempotence: enriched rows land in a `_batch=<id>`
  * partition with dynamic overwrite, so foreachBatch's at-least-once
  * redelivery overwrites only its own partition (the [[graft.cdc
  * .ScdHistory.foldHistory]] sink discipline).
  *
  * The dimension is read AT EACH TRIGGER's current committed manifest —
  * concurrent merges advance the snapshot between batches (each batch is
  * point-in-time consistent; the enrichment is as-current-as-committed,
  * the streaming-lookup contract).
  */
object LookupEnrich {

  /** Join one probe micro-batch against the pruned dimension subset.
    * `probeKeyCols` pair positionally with the dimension's recorded
    * bucket columns; dimension key + bookkeeping columns are dropped
    * from the output (the probe's own columns carry identity).
    */
  def enrichBatch(spark: SparkSession, dimDir: String, batch: DataFrame,
      probeKeyCols: Seq[String], dropDimCols: Seq[String] = Seq("op")): DataFrame = {
    val (dimKeyCols, schema) = MaterializedTable.keyLayout(spark, dimDir)
    val dim = MaterializedTable.readMatching(spark, dimDir, batch, probeKeyCols)
    // probe keys cast to the STORED key types — the same cast readMatching
    // hashed under, and no engine-chosen comparison coercion in the join
    val cond = probeKeyCols.zip(dimKeyCols)
      .map { case (p, k) => batch(p).cast(schema(k).dataType) === dim(k) }
      .reduce(_ && _)
    dimKeyCols.foldLeft(batch.join(dim, cond, "inner"))(
      (df, k) => df.drop(dim(k)))
      .drop(dropDimCols: _*)
  }

  /** Bounded drive: run the probe stream to completion (AvailableNow),
    * enriching each micro-batch via [[enrichBatch]] and landing results
    * idempotently under `outDir/_batch=<id>`.
    */
  def enrichToDir(probe: DataFrame, dimDir: String, outDir: String,
      probeKeyCols: Seq[String],
      checkpointLocation: Option[String] = None): Unit = {
    val spark = probe.sparkSession
    // deterministic checkpoint under the output dir: batch ids stay
    // monotonic across invocations, so a second run can never dynamically
    // overwrite a prior run's _batch=0 partition with fresh ids
    val ckpt = checkpointLocation.getOrElse(s"$outDir/_graft_checkpoint")
    val q = probe.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        enrichBatch(spark, dimDir, batch, probeKeyCols)
          .withColumn("_batch", lit(id))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch")
          .parquet(outDir)
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Enriched rows landed by [[enrichToDir]] (batch bookkeeping dropped). */
  def readEnriched(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("_batch")
}
