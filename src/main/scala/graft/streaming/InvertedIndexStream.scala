package graft.streaming

import graft.operators.InvertedIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** STREAMING INVERTED-INDEX MAINTENANCE from a document changelog — the
  * text twin of [[VectorIndexStream]] (same loop: a CDC feed keeps a saved
  * search artifact current), built on the LUCENE SEGMENT MODEL re-expressed
  * as dataflow, because an inverted index cannot do in-place updates at
  * scale (a doc's tokens hash into nearly every posting bucket):
  *
  *   - each micro-batch compacts to its latest event per doc and writes
  *     the alive docs' postings as segment `seg=<batchId>` (sub-partitioned
  *     by token bucket, so query-time bucket pruning still applies);
  *   - EVERY touched doc (update or delete) writes a tombstone row
  *     (doc_id, seg=<batchId>): a posting in segment s for doc d is live
  *     iff no tombstone (d, a) with a > s exists — a batch's own append
  *     outlives its own tombstone, an older version dies, a delete leaves
  *     only the tombstone. Resurrection works: a later insert writes a
  *     newer segment no existing tombstone can reach.
  *
  * Replay/crash safety is STRUCTURAL: both writes are dynamic-partition
  * overwrites of exactly the batch's own `seg=` partitions, so a
  * foreachBatch retry rewrites the same bytes (no markers needed — the
  * SketchStream/foldHistory discipline, here by partition layout).
  *
  * Scale shape: per batch, IO is O(batch) postings written + zero reads of
  * existing segments (append-only); query-time pays one broadcast
  * anti-join against the tombstone set on top of the usual pruned posting
  * read. Production systems fold old segments together in the background —
  * that is [[InvertedIndex.Index.compactDeletes]]'s rewrite shape applied
  * per segment group, deliberately out of scope here.
  */
object InvertedIndexStream {

  /** Drive `changelog` (op, doc_id, lsn, text) to completion
    * (AvailableNow), folding each micro-batch into the segmented index at
    * `dir`.
    *
    * The checkpoint defaults to a deterministic path UNDER `dir` so a
    * second maintain() resumes with monotonic batch ids — a fresh temp
    * checkpoint would restart ids at 0 and dynamically overwrite the prior
    * run's `seg=0` partitions (silent segment loss).
    */
  def maintain(changelog: DataFrame, dir: String, nBuckets: Int = 8,
      checkpointLocation: Option[String] = None): Unit = {
    val ckpt = checkpointLocation.getOrElse(s"$dir/_graft_checkpoint")
    val q = changelog.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        foldBatch(batch, dir, id, nBuckets)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One segment fold (exposed for the replay-idempotence spec). */
  def foldBatch(batch: DataFrame, dir: String, batchId: Long,
      nBuckets: Int): Unit = {
    val spark = batch.sparkSession
    // feeds three writes — localCheckpoint, NOT persist: the checkpoint
    // materializes AFTER AQE coalesces the compaction shuffle, so the three
    // consumer writes read a few dense partitions; a persist() pins the
    // cache at the un-coalesced shuffle width (canChangeCachedPlanOutput-
    // Partitioning is off) and was measured exploding the fold's task count
    // 60 → 459 at gate scale for zero saved work
    val latest = batch.groupBy(col("doc_id"))
      .agg(max_by(struct(col("op"), col("text")), col("lsn")).as("w"))
      .select(col("doc_id"), col("w.op").as("op"), col("w.text").as("text"))
      .localCheckpoint()
    val alive = latest.filter(col("op") =!= "delete")
    def dyn(df: DataFrame) = df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
    dyn(InvertedIndex.postings(alive, "doc_id", "text")
        .withColumn("tbucket", pmod(hash(col("token")), lit(nBuckets)))
        .withColumn("seg", lit(batchId))
        .repartition(col("tbucket")))
      .partitionBy("seg", "tbucket").parquet(s"$dir/segments")
    dyn(latest.select(col("doc_id")).withColumn("seg", lit(batchId)))
      .partitionBy("seg").parquet(s"$dir/tombs")
    // per-doc token lengths ride the same segment/tombstone lifecycle —
    // BM25's length normalization reads O(live docs), never re-derives
    // lengths from an O(postings) segment scan
    dyn(alive.select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= "")).cast("long")
          .as("dlen"))
        .withColumn("seg", lit(batchId)))
      .partitionBy("seg").parquet(s"$dir/doclens")
    // self-describing artifact (the save()/load() meta discipline) — the
    // content is constant per index, so write it once, not once per batch
    val metaPath = new org.apache.hadoop.fs.Path(s"$dir/meta/_SUCCESS")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaPath)) { // _SUCCESS: a crash mid-write re-writes
      import spark.implicits._
      Seq(nBuckets).toDF("n_buckets")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    }
  }

  /** Phrase search over the maintained index: pruned posting read (same
    * literal-isin bucket pruning as the batch index), segment-scoped
    * tombstone anti-join, then the shared adjacency core.
    */
  def searchPhrase(spark: SparkSession, dir: String, phrase: String): DataFrame = {
    val qtoks = phrase.split(" ").filter(_.nonEmpty).toSeq
    require(qtoks.nonEmpty, "empty phrase")
    InvertedIndex.phraseMatches(livePostings(spark, dir, qtoks), qtoks)
  }

  /** BM25-ranked retrieval over the maintained index — the batch index's
    * searchRanked THROUGH segments + tombstones: pruned live posting slice
    * and live doc lengths both resolve via the segment-scoped tombstone
    * anti-join, then the shared integer-exact scoring core ranks top-`k`.
    * The reference names a search index as CDC's first consumer
    * (README.md:30-32); this is that consumer's query face staying
    * correct under churn.
    */
  def searchRanked(spark: SparkSession, dir: String, query: String,
      k: Int): DataFrame = {
    val qtoks = query.split(" ").filter(_.nonEmpty).distinct.toSeq
    require(qtoks.nonEmpty, "empty query")
    val docLens = minusTombstoned(spark, dir,
      spark.read.parquet(s"$dir/doclens"))
      .select(col("doc_id"), col("dlen"))
    InvertedIndex.bm25TopK(livePostings(spark, dir, qtoks), docLens, k)
  }

  /** Pruned live posting slice for `qtoks`: literal-isin bucket pruning
    * (same Catalyst murmur3 as the build), then the tombstone anti-join.
    */
  private def livePostings(spark: SparkSession, dir: String,
      qtoks: Seq[String]): DataFrame = {
    import spark.implicits._
    val nBuckets = spark.read.parquet(s"$dir/meta").head().getInt(0)
    val buckets = qtoks.distinct.toDF("token")
      .select(pmod(hash(col("token")), lit(nBuckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    minusTombstoned(spark, dir, spark.read.parquet(s"$dir/segments")
      .filter(col("tbucket").isin(buckets: _*))
      .filter(col("token").isin(qtoks.distinct: _*)))
  }

  /** A segment row is live iff no tombstone (same doc, NEWER segment)
    * exists — a batch's own append outlives its own tombstone.
    */
  private def minusTombstoned(spark: SparkSession, dir: String,
      segRows: DataFrame): DataFrame = {
    val tombs = spark.read.parquet(s"$dir/tombs")
      .select(col("doc_id"), col("seg").as("t_seg"))
    // no broadcast hint: the tombstone set scales with churn (the r3
    // broadcast-audit rule — AQE still broadcasts it while it measures
    // small, and degrades to a hash anti-join when it doesn't)
    segRows.join(tombs,
      segRows("doc_id") === tombs("doc_id") && col("t_seg") > segRows("seg"),
      "left_anti")
  }
}
