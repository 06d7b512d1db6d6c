package graft.sources

import graft.SparkTestSession
import graft.cdc.MaterializedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The "graft" data source: format-based reads with filter-pushdown
  * bucket skipping.
  */
class GraftTableSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def seed(dir: String): Unit = {
    val b1 = (1 to 8).map(i => ("insert", s"k$i", i.toLong, 0L, i * 100L))
      .toDF("op", "key", "lsn", "seq", "v")
    MaterializedTable.merge(spark, dir, b1, Seq("key"), Seq("lsn", "seq"),
      numBuckets = 4, batchId = Some(1L), statsCols = Seq("v"))
  }

  test("format('graft') round-trips the table; schema hides _bucket") {
    val dir = java.nio.file.Files.createTempDirectory("gsrc1").toString + "/t"
    seed(dir)
    val df = spark.read.format("graft").load(dir)
    assert(!df.columns.contains("_bucket"))
    assert(df.select("key", "v").as[(String, Long)].collect().toSet ==
      MaterializedTable.read(spark, dir).select("key", "v")
        .as[(String, Long)].collect().toSet)
    // projection subset + the empty-projection COUNT(*) path
    assert(df.select("v").as[Long].collect().sorted.toSeq ==
      (1 to 8).map(_ * 100L))
    assert(df.count() == 8)
  }

  test("pushed-down filters skip buckets: an impossible range reads NOTHING (all files torn)") {
    val dir = java.nio.file.Files.createTempDirectory("gsrc2").toString + "/t"
    seed(dir)
    // tear EVERY bucket file: any listed read throws — only stats skipping
    // can answer from here
    for (v <- new java.io.File(dir).listFiles()
           if v.isDirectory && v.getName.matches("v\\d+");
         b <- Option(v.listFiles()).getOrElse(Array.empty)
           if b.getName.startsWith("_bucket=");
         f <- Option(b.listFiles()).getOrElse(Array.empty))
      java.nio.file.Files.write(f.toPath, "TORN".getBytes("UTF-8"))
    val df = spark.read.format("graft").load(dir)
    assert(df.filter(col("v") > 10000L).count() == 0,
      "impossible bound must skip every bucket before listing any file")
    assert(df.filter(col("v") > 10000L && col("key") === "k1").count() == 0,
      "one-sided AND still prunes")
    intercept[Exception] { df.count() } // the unfiltered read proves the tear
  }

  test("unsupported filter shapes stay correct (no skipping claim, Spark re-filters)") {
    val dir = java.nio.file.Files.createTempDirectory("gsrc3").toString + "/t"
    seed(dir)
    val df = spark.read.format("graft").load(dir)
    assert(df.filter(col("v") === 300L || col("key") === "k7")
      .select("key").as[String].collect().toSet == Set("k3", "k7"))
    assert(df.filter(col("key").isNotNull && col("v") <= 200L)
      .select("key").as[String].collect().toSet == Set("k1", "k2"))
  }

  test("write face: save modes, last-writer-wins appends, op routing, layout guard") {
    val dir = java.nio.file.Files.createTempDirectory("gsrc5").toString + "/t"
    // first write requires keys
    intercept[IllegalArgumentException] {
      Seq(("a", 1L)).toDF("k", "v").write.format("graft").save(dir)
    }
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
      .write.format("graft").option("keys", "k").save(dir)
    // append without order columns: the later save wins per key
    Seq(("a", 10L), ("c", 3L)).toDF("k", "v")
      .write.format("graft").option("keys", "k")
      .mode("append").save(dir)
    def state() = spark.read.format("graft").load(dir)
      .select("k", "v").as[(String, Long)].collect().toMap
    assert(state() == Map("a" -> 10L, "b" -> 2L, "c" -> 3L))
    // op routing: deletes through the write face
    Seq(("delete", "b", 0L)).toDF("o", "k", "v")
      .write.format("graft").option("keys", "k").option("opCol", "o")
      .mode("append").save(dir)
    assert(state() == Map("a" -> 10L, "c" -> 3L))
    // errorifexists / ignore
    intercept[IllegalStateException] {
      Seq(("z", 0L)).toDF("k", "v").write.format("graft")
        .option("keys", "k").mode("errorifexists").save(dir)
    }
    Seq(("z", 0L)).toDF("k", "v").write.format("graft")
      .option("keys", "k").mode("ignore").save(dir)
    assert(!state().contains("z"))
    // layout guard: different keys rejected on an existing table
    intercept[IllegalArgumentException] {
      Seq(("a", 1L)).toDF("k", "v").write.format("graft")
        .option("keys", "v").mode("append").save(dir)
    }
    // overwrite replaces wholesale (fresh layout allowed)
    Seq((7L, "x")).toDF("id", "s").write.format("graft")
      .option("keys", "id").mode("overwrite").save(dir)
    assert(spark.read.format("graft").load(dir)
      .select("id", "s").as[(Long, String)].collect().toSeq == Seq((7L, "x")))
  }

  test("overwrite validates BEFORE destroying: bad options leave the table intact; keys inherit") {
    val dir = java.nio.file.Files.createTempDirectory("gsrc7").toString + "/t"
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
      .write.format("graft").option("keys", "k").save(dir)
    def state() = spark.read.format("graft").load(dir)
      .select("k", "v").as[(String, Long)].collect().toMap
    // malformed numBuckets must throw while the committed table still reads
    intercept[NumberFormatException] {
      Seq(("x", 9L)).toDF("k", "v").write.format("graft")
        .option("keys", "k").option("numBuckets", "not-a-number")
        .mode("overwrite").save(dir)
    }
    assert(state() == Map("a" -> 1L, "b" -> 2L),
      "failed option validation must not destroy the committed table")
    // overwrite WITHOUT .option('keys') inherits the committed layout
    Seq(("c", 3L)).toDF("k", "v")
      .write.format("graft").mode("overwrite").save(dir)
    assert(state() == Map("c" -> 3L))
    assert(MaterializedTable.keyLayout(spark, dir)._1 == Seq("k"))
    // a FRESH dir still requires keys, and nothing is left behind on failure
    val fresh = java.nio.file.Files.createTempDirectory("gsrc8").toString + "/t"
    intercept[IllegalArgumentException] {
      Seq(("a", 1L)).toDF("k", "v").write.format("graft")
        .mode("overwrite").save(fresh)
    }
    assert(!MaterializedTable.exists(spark, fresh))
  }

  test("write face: explicit order columns rank row versions within and across writes") {
    val dir = java.nio.file.Files.createTempDirectory("gsrc6").toString + "/t"
    Seq(("a", 5L, 100L), ("a", 9L, 900L), ("a", 7L, 700L))
      .toDF("k", "ts", "v")
      .write.format("graft").option("keys", "k").option("orderCols", "ts")
      .save(dir)
    def va() = spark.read.format("graft").load(dir)
      .filter(col("k") === "a").select("v").as[Long].head()
    assert(va() == 900L) // newest ts wins within the write
    // an append with an OLDER ts must NOT win
    Seq(("a", 6L, 600L)).toDF("k", "ts", "v")
      .write.format("graft").option("keys", "k").option("orderCols", "ts")
      .mode("append").save(dir)
    assert(va() == 900L)
  }

  test("writeStream.format('graft'): per-batch exactly-once merges; restart resumes; replay no-op") {
    val dir = java.nio.file.Files.createTempDirectory("gsink").toString
    val (tbl, src, ck) = (s"$dir/t", s"$dir/src", s"$dir/ck")
    def stage(i: Int, rows: (String, String, Long, Long)*): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"gsinkb$i").toString
      rows.toSeq.toDF("op", "k", "lsn", "v").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(src, s"b$i.parquet")
      new java.io.File(src).mkdirs()
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L); ()
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "op STRING, k STRING, lsn BIGINT, v BIGINT")
    def drive(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream.format("graft")
        .option("keys", "k").option("opCol", "op")
        .option("orderCols", "lsn").option("numBuckets", "2")
        .option("checkpointLocation", ck)
        .start(tbl)
      try q.processAllAvailable() finally q.stop()
    }
    stage(0, ("insert", "a", 1L, 10L), ("insert", "b", 2L, 20L))
    stage(1, ("update", "a", 3L, 11L), ("delete", "b", 4L, 0L))
    drive()
    def state() = spark.read.format("graft").load(tbl)
      .select("k", "v").as[(String, Long)].collect().toMap
    assert(state() == Map("a" -> 11L))
    // restart with NEW files: the deterministic checkpoint resumes with
    // monotonic ids — new data lands, nothing re-folds
    stage(2, ("insert", "c", 5L, 30L))
    drive()
    assert(state() == Map("a" -> 11L, "c" -> 30L))
    // replay from a FRESH checkpoint with poisoned payloads: every batch id
    // is at-or-below the merge watermark — whole drive is a no-op
    val q2 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream.format("graft")
      .option("keys", "k").option("opCol", "op").option("orderCols", "lsn")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gsinkck2").toString)
      .start(tbl)
    try q2.processAllAvailable() finally q2.stop()
    assert(state() == Map("a" -> 11L, "c" -> 30L))
  }

  test("plain SQL over a temp view gets the same skipping") {
    val dir = java.nio.file.Files.createTempDirectory("gsrc4").toString + "/t"
    seed(dir)
    spark.read.format("graft").load(dir).createOrReplaceTempView("gsrc_t")
    val got = spark.sql(
      "SELECT key, v FROM gsrc_t WHERE v >= 200 AND v < 500 ORDER BY key")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("k2", 200L), ("k3", 300L), ("k4", 400L)))
  }
}
