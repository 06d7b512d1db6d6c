package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental latest-state materialization on plain parquet — the
  * SURVEY §7.4 answer to state growth: "prefer Delta-merge materialization
  * for 100 TB-scale tables, keyed state only for hot paths".
  *
  * Layout: the state directory is hash-partitioned on the key into
  * `_bucket=N` subdirectories. A merge then:
  *   1. computes the buckets touched by the incoming changelog batch,
  *   2. reads ONLY those buckets of existing state (partition pruning),
  *   3. compacts existing ∪ incoming per key,
  *   4. rewrites only the touched buckets (dynamic partition overwrite).
  *
  * At 100 TB with a well-sized bucket count, a micro-batch touching k keys
  * costs O(k/numBuckets · stateSize) IO — untouched buckets are never read
  * or written. This is MERGE-INTO dataflow on a format without transaction
  * logs; swap the writer for Delta/Iceberg MERGE when those jars exist and
  * steps 1–3 stay identical.
  */
object MaterializedTable {

  /** Stable bucket of the key columns (Spark murmur3 — internal layout only,
    * nothing external depends on it).
    */
  private def bucketCol(keyCols: Seq[String], numBuckets: Int) =
    pmod(hash(keyCols.map(col): _*), lit(numBuckets)).as("_bucket")

  /** Merge a changelog batch into the materialized state at `dir`.
    *
    * @param updates  changelog rows (op/key/order columns, SURVEY envelope
    *                 or any keyed changelog)
    * @return the number of buckets rewritten
    */
  def merge(spark: SparkSession, dir: String, updates: DataFrame,
      keyCols: Seq[String], orderCols: Seq[String], opCol: String = "op",
      numBuckets: Int = 64): Int = {
    // Schema evolution (below) applies to PAYLOAD columns only: a batch
    // missing a control column must fail here, not be null-backfilled — a
    // null op on a winning row would silently delete its key (null =!=
    // 'delete' is NULL, which the tombstone filter treats as not-live), and
    // a null order column corrupts the newest-of comparison.
    val missing = (keyCols ++ orderCols :+ opCol).distinct
      .filterNot(updates.columns.contains)
    require(missing.isEmpty,
      s"changelog batch is missing control column(s) ${missing.mkString(", ")} " +
        "— schema evolution applies to payload columns only")
    // existing state re-enters compaction as the baseline: it must never
    // win against a genuinely newer incoming row, and vice versa — both
    // carry their original order columns, so plain compaction is correct.
    mergeBuckets(spark, dir, updates, keyCols, numBuckets) { combined =>
      LatestState.batch(combined, keyCols, orderCols, opCol, keepDeleted = false)
    }
  }

  /** The bucketed-merge dataflow shared by [[merge]] (latest-state
    * compaction) and [[IncrementalAgg.foldStanding]] (aggregate folding):
    * bucket the incoming rows on `bucketKeyCols`, read ONLY the touched
    * buckets of existing state, apply `combine` to existing ∪ incoming, and
    * rewrite the touched buckets. `combine` receives rows that still carry
    * `_bucket` and must preserve it (grouping by the bucket's source key
    * keeps it functionally determined).
    *
    * The existing∪incoming union is by name with allowMissingColumns both
    * ways = sink-side schema evolution (the ALTER TABLE churn of
    * spec/functional/topic_spec.rb:166–274 reaching the materialized state,
    * not just the decoder): a NEW incoming column widens the state with old
    * rows null-backfilled; a DROPPED column keeps its historical values on
    * rows that still carry them (a newer incoming winner leaves it null).
    */
  private[cdc] def mergeBuckets(spark: SparkSession, dir: String,
      updates: DataFrame, bucketKeyCols: Seq[String], numBuckets: Int)(
      combine: DataFrame => DataFrame): Int = {
    // Hadoop FS, not java.io.File: state dirs live on HDFS/S3 at scale, where
    // a local-File exists() would silently report false and corrupt the merge.
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // "has state" = bucket directories present, not bare path existence: a
    // pre-created empty directory (mkdir-then-merge is a common callsite
    // shape) must take the first-write path, not a doomed read.
    val exists = fs.exists(hPath) &&
      fs.listStatus(hPath).exists(_.getPath.getName.startsWith("_bucket="))
    // persist: the updates plan feeds both the touched-bucket collect and the
    // combine/write — without this it would execute twice
    val incoming = updates.withColumn("_bucket", bucketCol(bucketKeyCols, numBuckets))
      .persist()
    try {
      val touched = incoming.select("_bucket").distinct()
        .collect().map(_.getInt(0)).sorted
      val combined = if (exists) {
        val existing = readState(spark, dir)
          .filter(col("_bucket").isin(touched.map(Integer.valueOf).toSeq: _*))
        existing.unionByName(incoming, allowMissingColumns = true)
      } else incoming
      val out = combine(combined)
        .localCheckpoint() // computed twice below (write + bucket list)
      // partitionOverwriteMode as a per-write option, NOT a session conf
      // mutation: a spark.conf.set would leak dynamic-overwrite semantics to
      // concurrent writes on the same session (and the finally-restore could
      // clobber a concurrent merge's setting).
      out
        .write.mode(if (exists) "overwrite" else "append")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bucket")
        .parquet(dir)
      // dynamic overwrite only replaces partitions PRESENT in the output: a
      // touched bucket whose keys were all tombstoned (or whose groups all
      // retracted to zero) writes zero rows and would silently keep its
      // stale files — delete those explicitly.
      val written = out.select("_bucket").distinct()
        .collect().map(_.getInt(0)).toSet
      for (b <- touched if !written.contains(b)) {
        val p = new org.apache.hadoop.fs.Path(s"$dir/_bucket=$b")
        if (fs.exists(p)) fs.delete(p, true)
      }
      // schema sidecar: an EMPTY state (first batch all tombstones, or every
      // key later deleted) has no parquet footer to infer from — a
      // partitioned write of zero rows emits no files at all — so the state
      // schema rides in a `_`-prefixed file (invisible to parquet listing)
      // and [[read]] reconstructs an empty relation from it. Rewritten on
      // every merge so it always reflects the evolved (widened) schema.
      // Written to a temp name, then renamed into place with
      // FileContext.rename(OVERWRITE) — a true atomic replace on HDFS/local
      // (plain FileSystem.rename won't overwrite, and delete-then-rename
      // opens a window where a crash or concurrent reader sees NO sidecar
      // at all; rename throws on failure instead of returning an ignorable
      // boolean). [[readState]] additionally falls back to the .tmp file
      // when the primary is absent, covering a crash between create and
      // rename on a previous run.
      val sidecar = new org.apache.hadoop.fs.Path(dir, schemaFile)
      val sidecarTmp = new org.apache.hadoop.fs.Path(dir, schemaFile + ".tmp")
      val os = fs.create(sidecarTmp, true)
      try os.write(out.schema.json.getBytes("UTF-8")) finally os.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        sidecar.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(sidecarTmp, sidecar,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      touched.length
    } finally {
      incoming.unpersist()
    }
  }

  /** Bin-pack small files: rewrite every bucket whose parquet file count
    * exceeds `maxFilesPerBucket` down to ONE file each; buckets at or under
    * the threshold are neither read nor written. Returns the number of
    * buckets compacted.
    *
    * Why this exists at 100 TB: each merge writes a touched bucket from up
    * to `spark.sql.shuffle.partitions` tasks, so a standing table
    * accumulates O(shufflePartitions) files per bucket per merge cycle —
    * and scan cost (footer reads, task scheduling) degrades with file
    * count, not data size. This is the OPTIMIZE/bin-packing maintenance
    * operation of transactional lakehouse formats, on plain parquet.
    *
    * Shape: one job for all oversized buckets — `repartition(col(_bucket))`
    * hash-clusters each bucket wholly into one task, so the partitioned
    * write emits exactly one file per bucket; dynamic partition overwrite
    * replaces only the oversized buckets. IO is O(data in oversized
    * buckets), the rewrite floor.
    */
  def compact(spark: SparkSession, dir: String, maxFilesPerBucket: Int = 1): Int = {
    require(maxFilesPerBucket >= 1,
      s"maxFilesPerBucket must be >= 1, got $maxFilesPerBucket")
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) return 0
    val oversized = fs.listStatus(hPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_bucket="))
      .filter(st => fs.listStatus(st.getPath)
        .count(_.getPath.getName.endsWith(".parquet")) > maxFilesPerBucket)
      .map(_.getPath.getName.stripPrefix("_bucket=").toInt)
      .sorted
    if (oversized.isEmpty) return 0
    readState(spark, dir)
      .filter(col("_bucket").isin(oversized.map(Integer.valueOf): _*))
      .repartition(oversized.size, col("_bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_bucket")
      .parquet(dir)
    oversized.size
  }

  /** State-dir read with schema merging: after a widening merge, TOUCHED
    * buckets carry the new schema while untouched buckets keep the old one —
    * a plain parquet read would pin whichever file it sampled first and
    * silently drop the new column from the other buckets.
    *
    * Scale note: mergeSchema reconciles footers, not data — O(files) metadata
    * work, not a scan. On a no-evolution table it is a no-op.
    */
  private[cdc] def readState(spark: SparkSession, dir: String): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBuckets = fs.exists(hPath) &&
      fs.listStatus(hPath).exists(_.getPath.getName.startsWith("_bucket="))
    if (hasBuckets) spark.read.option("mergeSchema", "true").parquet(dir)
    else {
      // a merged-but-currently-empty state (every key tombstoned) has no
      // parquet to infer from; the sidecar schema written by every merge
      // reconstructs the empty relation instead of UNABLE_TO_INFER_SCHEMA.
      // Fall back to the .tmp file if the primary is missing — a crash
      // between the sidecar create and its atomic rename leaves only the
      // fully-written temp (merge always finishes the write before rename).
      val primary = new org.apache.hadoop.fs.Path(dir, schemaFile)
      val tmp = new org.apache.hadoop.fs.Path(dir, schemaFile + ".tmp")
      val sf = if (fs.exists(primary)) primary else tmp
      require(fs.exists(sf), s"no materialized state at $dir")
      val in = fs.open(sf)
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val schema = org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  private val schemaFile = "_graft_schema.json"

  /** Current materialized state (bucket column dropped). */
  def read(spark: SparkSession, dir: String): DataFrame =
    readState(spark, dir).drop("_bucket")
}
