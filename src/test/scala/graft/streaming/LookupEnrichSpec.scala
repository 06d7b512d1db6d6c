package graft.streaming

import graft.SparkTestSession
import graft.cdc.MaterializedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-pruned streaming lookup enrichment (LookupEnrich +
  * MaterializedTable.readMatching).
  */
class LookupEnrichSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def seedDim(dir: String): Unit = {
    import spark.implicits._
    val b1 = (1 to 8).map(i => ("insert", s"k$i", i.toLong, 0L, i * 100L))
      .toDF("op", "key", "lsn", "seq", "v")
    MaterializedTable.merge(spark, dir, b1, Seq("key"), Seq("lsn", "seq"),
      numBuckets = 4, batchId = Some(1L))
  }

  test("readMatching reads only the probe's buckets (others may be garbage)") {
    import spark.implicits._
    val dir = tmp("lke1") + "/dim"
    seedDim(dir)
    // k3's bucket (2, per the layout's murmur3) — tear every other bucket
    val probe = Seq("k3").toDF("uid")
    val got0 = MaterializedTable.readMatching(spark, dir, probe, Seq("uid"))
    val keys0 = got0.select("key").collect().map(_.getString(0)).toSet
    assert(keys0.contains("k3"))
    val keep = spark.range(1).select(
      pmod(hash(lit("k3")), lit(4))).head().getInt(0)
    for (v <- new java.io.File(dir).listFiles()
           if v.isDirectory && v.getName.matches("v\\d+");
         b <- Option(v.listFiles()).getOrElse(Array.empty)
           if b.getName.startsWith("_bucket=") &&
             b.getName.stripPrefix("_bucket=").toInt != keep;
         f <- Option(b.listFiles()).getOrElse(Array.empty))
      java.nio.file.Files.write(f.toPath, "TORN".getBytes("UTF-8"))
    val got = MaterializedTable.readMatching(spark, dir, probe, Seq("uid"))
      .select("key").collect().map(_.getString(0)).toSet
    assert(got == keys0, "pruned read must not touch any other bucket")
    // bucket-granular contract: a superset within the touched bucket only
    assert(got.forall(k => spark.range(1).select(
      pmod(hash(lit(k)), lit(4))).head().getInt(0) == keep))
  }

  test("null probe keys contribute no buckets; empty probe reads nothing") {
    import spark.implicits._
    val dir = tmp("lke2") + "/dim"
    seedDim(dir)
    val probe = Seq(Option.empty[String], Some("k5")).toDF("uid")
    val got = MaterializedTable.readMatching(spark, dir, probe, Seq("uid"))
      .select("key").collect().map(_.getString(0)).toSet
    assert(got.contains("k5"))
    val none = MaterializedTable.readMatching(spark, dir,
      Seq(Option.empty[String]).toDF("uid"), Seq("uid"))
    assert(none.isEmpty)
  }

  test("enrichBatch ≡ plain join, casting probe key types to the stored layout") {
    import spark.implicits._
    val dir = tmp("lke3") + "/dim"
    seedDim(dir) // keys are STRINGS "k..."; numeric probe exercises cast path
    val probe = Seq((1L, "k2"), (2L, "k2"), (3L, "k7"), (4L, "nope"))
      .toDF("ev", "uid")
    val got = LookupEnrich.enrichBatch(spark, dir, probe, Seq("uid"))
      .select("ev", "uid", "v").as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "k2", 200L), (2L, "k2", 200L), (3L, "k7", 700L)))
    // output drops dim bookkeeping (op) and dim key, keeps probe identity
    val cols = LookupEnrich.enrichBatch(spark, dir, probe, Seq("uid")).columns
    assert(!cols.contains("op") && cols.count(_ == "uid") == 1)
  }

  test("bounded multi-batch drive: enrichment ≡ batch join; per-batch partitions land") {
    import spark.implicits._
    val dir = tmp("lke4")
    val dimDir = s"$dir/dim"; val probeDir = s"$dir/probe"; val outDir = s"$dir/out"
    seedDim(dimDir)
    // three probe files → three micro-batches at maxFilesPerTrigger=1
    val probes = Seq(
      Seq((1L, "k1"), (2L, "k2")), Seq((3L, "k3"), (4L, "gone")),
      Seq((5L, "k5"), (6L, "k1")))
    probes.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("ev", "uid").coalesce(1).write.parquet(s"$probeDir/f$i")
    }
    val files = new java.io.File(probeDir).listFiles().map(_.toString).sorted
    val schema = spark.read.parquet(files.head).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$probeDir/f*")
    LookupEnrich.enrichToDir(stream, dimDir, outDir, Seq("uid"))
    val got = LookupEnrich.readEnriched(spark, outDir)
      .select("ev", "uid", "v").as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "k1", 100L), (2L, "k2", 200L), (3L, "k3", 300L),
      (5L, "k5", 500L), (6L, "k1", 100L)))
    val batches = new java.io.File(outDir).listFiles()
      .count(_.getName.startsWith("_batch="))
    assert(batches >= 2, s"expected a multi-batch drive, got $batches")
  }

  test("each drive enriches against the CURRENT committed snapshot") {
    import spark.implicits._
    val dir = tmp("lke5")
    val dimDir = s"$dir/dim"
    seedDim(dimDir)
    val probe = Seq((1L, "k4")).toDF("ev", "uid")
    assert(LookupEnrich.enrichBatch(spark, dimDir, probe, Seq("uid"))
      .select("v").head().getLong(0) == 400L)
    val upd = Seq(("update", "k4", 99L, 0L, 4444L))
      .toDF("op", "key", "lsn", "seq", "v")
    MaterializedTable.merge(spark, dimDir, upd, Seq("key"), Seq("lsn", "seq"),
      numBuckets = 4, batchId = Some(2L))
    assert(LookupEnrich.enrichBatch(spark, dimDir, probe, Seq("uid"))
      .select("v").head().getLong(0) == 4444L)
  }
}
