package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract).
  *
  * Local-bench-specific tuning, documented for the 100 TB reading:
  *   - maxPartitionBytes lowered to 2 MiB: the sf test tables are single
  *     parquet files (lineitem sf0.1 ≈ 10 MiB); the 128 MiB default would
  *     scan them on ONE core. On a real cluster data arrives in many files
  *     and the default is right.
  *   - a warm-up action runs first so JVM/codegen/FileSystem init isn't
  *     billed to whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        new java.io.File(sys.props("java.io.tmpdir"), "graft-warehouse").getPath)
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (256 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: parquet reader + the changelog-derivation path, so JVM/codegen
    // init isn't billed to whichever query runs first (alphabetically cdc01,
    // which otherwise pays ~1.5 s of first-execution codegen for the
    // JSON/envelope expressions every CDC query shares)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    graft.cdc.ChangelogGen.fromEvents(spark, sfDir).limit(64).toDF().count()

    // optional args = query-name prefixes to run (local iteration aid);
    // no args = the full driver-contract surface
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.exists(n.startsWith) }
    // a failed query reports duration -1 (a silently-tiny duration would make
    // a REGRESSION look like a speedup in the round-over-round comparison)
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
      }
    }
    // CDC throughput micro-bench (BASELINE.md): envelopes/s through
    // generate → latest-state compaction. Guarded: the one-JSON-line driver
    // contract must survive any failure here (and events.parquet is only
    // readable through Tables.events' nanos handling).
    val cdcEps = try {
      val nEvents = graft.Tables.events(spark, sfDir).count()
      val tCdc0 = System.nanoTime()
      graft.cdc.LatestState.batch(
        graft.cdc.ChangelogGen.fromEvents(spark, sfDir).toDF(),
        Seq("table", "key"), Seq("lsn", "seq")).count()
      nEvents / ((System.nanoTime() - tCdc0) / 1e9)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] cdc micro-bench failed: ${e.getMessage}")
        -1.0
    }

    // The driver captures a BOUNDED (~2,000-char) stdout tail; 101 full-name
    // keys at 3 decimals is ~3.3 kB and arrived truncated (`parsed: null`) in
    // BENCH r4 AND r5. Two defenses: (a) keys shrink to the unique gate
    // prefix before the first '_' ("q46_auto_overlap_join" -> "q46") — ~1.4 kB
    // total; (b) ms precision (sub-ms jitter is noise anyway). If two names
    // ever shared a prefix the full names are kept for both (correct > short).
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def prefix(name: String): String = name.takeWhile(_ != '_')
    val prefixCounts = results.groupBy { case (k, _) => prefix(k) }
      .map { case (p, g) => p -> g.size }
    val qs = results.map { case (k, v) =>
      val key = if (prefixCounts(prefix(k)) == 1) prefix(k) else k
      "\"" + key + "\":" + fmt(v)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
      s""""cdc_events_per_sec":${cdcEps.toLong},"sf":"$sfDir"}""")
    spark.stop()
  }
}
