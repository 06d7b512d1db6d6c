package graft.streaming

import graft.SparkTestSession
import graft.cdc.{MaterializedTable, TableGroup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming transactional multi-table sink (GroupCommitStream). */
class GroupCommitStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withRetain[A](n: Int)(f: => A): A = {
    spark.conf.set("spark.graft.materialized.retainVersions", n.toString)
    try f finally spark.conf.unset("spark.graft.materialized.retainVersions")
  }

  private def members(batch: DataFrame): Seq[TableGroup.TableBatch] = Seq(
    TableGroup.TableBatch("by_user",
      batch.select("op", "key", "lsn", "seq", "v"), Seq("key")),
    TableGroup.TableBatch("by_type",
      batch.filter(col("op") =!= "delete")
        .select("op", "key", "typ", "lsn", "seq"), Seq("key", "typ")))

  private def stage(dir: String, rows: Seq[(String, String, Long, Long, String)],
      part: Int): Unit =
    rows.toDF("op", "key", "lsn", "v", "typ")
      .withColumn("seq", lit(0L))
      .coalesce(1).write.parquet(s"$dir/f$part")

  test("per-micro-batch group commits fold the whole stream; fresh-checkpoint replay is silent") {
    withRetain(4) {
      val dir = java.nio.file.Files.createTempDirectory("gcs1").toString
      val root = s"$dir/g"; val src = s"$dir/src"
      stage(src, Seq(("insert", "a", 1L, 10L, "x"), ("insert", "b", 2L, 20L, "y")), 0)
      stage(src, Seq(("update", "a", 3L, 11L, "x"), ("insert", "c", 4L, 30L, "z")), 1)
      stage(src, Seq(("delete", "b", 5L, 0L, "y"), ("update", "c", 6L, 33L, "z")), 2)
      val schema = spark.read.parquet(s"$src/f0").schema
      def stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/f*")
      GroupCommitStream.run(stream, root, members, Seq("lsn", "seq"),
        numBuckets = 4)
      val u = TableGroup.read(spark, root, "by_user")
        .select("key", "v").as[(String, Long)].collect().toMap
      assert(u == Map("a" -> 11L, "c" -> 33L)) // b tombstoned
      val t = TableGroup.read(spark, root, "by_type")
        .select("key", "typ").as[(String, String)].collect().toSet
      assert(t == Set(("a", "x"), ("b", "y"), ("c", "z"))) // upsert-only member
      assert(TableGroup.readRoot(spark, root).get.lastBatchId >= 2)

      // REPLAY: the same stream from an EXPLICIT fresh checkpoint (batch
      // ids restart at 0) with poisoned payloads — every group commit is a
      // watermark no-op, state multiset-unchanged. (The DEFAULT checkpoint
      // now lives under the root and would resume, not replay — see the
      // monotonic-resume test below.)
      val before = TableGroup.read(spark, root, "by_user").collect().toSeq
      val poisonedDir = s"$dir/poison"
      stage(poisonedDir, Seq(("update", "a", 1L, -999L, "P")), 0)
      stage(poisonedDir, Seq(("update", "c", 2L, -999L, "P")), 1)
      val pStream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$poisonedDir/f*")
      GroupCommitStream.run(pStream, root, members, Seq("lsn", "seq"),
        numBuckets = 4, checkpointLocation = Some(
          java.nio.file.Files.createTempDirectory("gcs1fresh").toString))
      val after = TableGroup.read(spark, root, "by_user").collect().toSeq
      assert(before.toSet == after.toSet && before.size == after.size,
        "fresh-checkpoint replay must fold nothing")
    }
  }

  test("members see exactly their routed slice; group face is cross-table consistent per batch") {
    withRetain(4) {
      val dir = java.nio.file.Files.createTempDirectory("gcs2").toString
      val root = s"$dir/g"; val src = s"$dir/src"
      stage(src, Seq(("insert", "k", 1L, 5L, "t1")), 0)
      val schema = spark.read.parquet(s"$src/f0").schema
      GroupCommitStream.run(
        spark.readStream.schema(schema).parquet(s"$src/f*"),
        root, members, Seq("lsn", "seq"), numBuckets = 2)
      // by_user carries v but no typ; by_type carries typ but no v
      assert(!TableGroup.read(spark, root, "by_user").columns.contains("typ"))
      assert(!TableGroup.read(spark, root, "by_type").columns.contains("v"))
      // both members pinned at the same group commit
      val g = TableGroup.readRoot(spark, root).get
      assert(g.tables.keySet == Set("by_user", "by_type"))
      // member manifests agree with the pins (no hidden advance)
      for ((t, v) <- g.tables)
        assert(MaterializedTable.listVersions(spark, s"$root/$t").max == v)
    }
  }

  test("continuous face: start() keeps running, folds arriving files live, and resumes monotonic after stop") {
    withRetain(4) {
      val dir = java.nio.file.Files.createTempDirectory("gcs3").toString
      val root = s"$dir/g"; val src = s"$dir/src"
      stage(src, Seq(("insert", "a", 1L, 10L, "x")), 0)
      val schema = spark.read.parquet(s"$src/f0").schema
      def stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/f*")
      val q = GroupCommitStream.start(stream, root, members, Seq("lsn", "seq"),
        numBuckets = 2)
      try {
        q.processAllAvailable()
        assert(TableGroup.read(spark, root, "by_user").count() == 1L)
        // files landing while the query is LIVE fold without re-starting
        stage(src, Seq(("insert", "b", 2L, 20L, "y"),
          ("update", "a", 3L, 11L, "x")), 1)
        q.processAllAvailable()
        assert(TableGroup.read(spark, root, "by_user")
          .select("key", "v").as[(String, Long)].collect().toMap ==
          Map("a" -> 11L, "b" -> 20L))
      } finally q.stop()
      val watermark = TableGroup.readRoot(spark, root).get.lastBatchId
      // second start() on the same root: the default under-root checkpoint
      // resumes with MONOTONIC batch ids — new data folds, none swallowed
      stage(src, Seq(("delete", "b", 4L, 0L, "y")), 2)
      val q2 = GroupCommitStream.start(stream, root, members, Seq("lsn", "seq"),
        numBuckets = 2)
      try {
        q2.processAllAvailable()
        assert(TableGroup.read(spark, root, "by_user")
          .select("key", "v").as[(String, Long)].collect().toMap ==
          Map("a" -> 11L))
        assert(TableGroup.readRoot(spark, root).get.lastBatchId > watermark)
      } finally q2.stop()
    }
  }

  test("continuous face under load: 20+ rapid group commits while readers poll — monotonic pins, no torn observation") {
    withRetain(4) {
      val dir = java.nio.file.Files.createTempDirectory("gcs4").toString
      val root = s"$dir/g"; val src = s"$dir/src"
      stage(src, Seq(("insert", "k0", 0L, 0L, "x")), 0)
      val schema = spark.read.parquet(s"$src/f0").schema
      def stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/f*")
      val nCommits = 24
      val stopFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val maxSeen = new java.util.concurrent.atomic.AtomicLong(-1L)
      // the poller asserts the live invariants: root watermark and every
      // member pin only ever move FORWARD (a torn/partial observation
      // would show as a regression or a watermark/pin mismatch window)
      val poller = new Thread(() => {
        try {
          var (lastB, lastU, lastT) = (-1L, -1L, -1L)
          while (!stopFlag.get()) {
            TableGroup.readRoot(spark, root).foreach { g =>
              assert(g.lastBatchId >= lastB,
                s"root watermark regressed: $lastB -> ${g.lastBatchId}")
              val u = g.tables.getOrElse("by_user", -1L)
              val t = g.tables.getOrElse("by_type", -1L)
              assert(u >= lastU && t >= lastT,
                s"member pin regressed: u $lastU->$u, t $lastT->$t")
              lastB = g.lastBatchId; lastU = u; lastT = t
              maxSeen.getAndUpdate(m => math.max(m, g.lastBatchId))
            }
          }
        } catch { case th: Throwable => failure.compareAndSet(null, th) }
      })
      val q = GroupCommitStream.start(stream, root, members, Seq("lsn", "seq"),
        numBuckets = 2)
      poller.start()
      try {
        // sequential single-file writes: mtime order = changelog order (the
        // ordered-source contract); the LIVE query picks each up unprompted
        for (k <- 1 to nCommits)
          stage(src, Seq(("insert", s"k$k", k.toLong, k * 10L, "x")), k)
        val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
        while (maxSeen.get() < nCommits && failure.get() == null &&
            System.nanoTime() < deadline) Thread.sleep(50L)
      } finally {
        stopFlag.set(true); poller.join(10000); q.stop()
      }
      assert(failure.get() == null, s"poller failed: ${Option(failure.get())}")
      assert(maxSeen.get() >= nCommits,
        s"the live query never caught up: watermark ${maxSeen.get()}")
      // the full fold landed exactly once per key
      val u = TableGroup.read(spark, root, "by_user")
        .select("key", "v").as[(String, Long)].collect().toMap
      assert(u == (0 to nCommits).map(k => s"k$k" -> k * 10L).toMap)
    }
  }
}
