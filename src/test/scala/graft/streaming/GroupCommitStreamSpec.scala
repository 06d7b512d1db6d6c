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
}
