package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Creation-time start offset of a no-backfill streaming source, persisted
  * under the stream's own metadata dir (the `metadataPath` Spark hands
  * `StreamSourceProvider.createSource` — checkpoint-scoped, one per query).
  *
  * Why it must be persisted: a V1 source re-created on RESTART re-derives
  * "the offset current at query start" as NOW, but the engine may re-plan
  * batch 0 (offset log written, commit log not yet) with the ORIGINAL end
  * offset — and a fresh, newer start then reads as an offset REGRESSION
  * (group feed) or silently swallows the first window (from >= to). The
  * start offset is part of the stream's identity; it lives with the
  * checkpoint. Found live by the subscriber-lag drill in
  * GraftGroupChangeFeedSourceSpec.
  */
private[sources] object StartOffsetLog {

  /** Return the persisted start offset, or persist `compute` on first
    * creation. Empty `metadataPath` (direct construction in tests/tools)
    * skips persistence and just computes. Single-writer by construction
    * (the engine creates one source per query); the write is
    * temp-file + rename so a crash mid-write can never leave a torn
    * offset — an empty/absent file re-computes.
    */
  def resolve(spark: SparkSession, metadataPath: String,
      compute: => String): String = {
    if (metadataPath == null || metadataPath.isEmpty) return compute
    val p = new Path(metadataPath, "graft-start-offset")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      if (s.nonEmpty) return s
    }
    val v = compute
    val tmp = new Path(metadataPath, ".graft-start-offset.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.getBytes("UTF-8")) finally out.close()
    // FileContext.rename(OVERWRITE): one atomic replace, even over the
    // empty/torn leftover that the recompute path can leave behind. The
    // previous delete-then-rename opened a crash window with NO destination
    // file — a restart inside it would silently recompute the start as
    // "now", the exact regression this class exists to prevent. rename
    // throws (never returns an ignorable boolean), so failure stays loud.
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    v
  }
}
