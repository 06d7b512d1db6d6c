package graft.sources

import graft.SparkTestSession
import graft.cdc.TableGroup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graft-group-cdf streaming source: root manifests as offsets,
  * cross-table-consistent change batches.
  */
class GraftGroupChangeFeedSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withRetain[A](n: Int)(f: => A): A = {
    spark.conf.set("spark.graft.materialized.retainVersions", n.toString)
    try f finally spark.conf.unset("spark.graft.materialized.retainVersions")
  }

  private def rows(rs: (String, String, Long, Long)*): DataFrame =
    rs.toSeq.toDF("op", "key", "lsn", "v").withColumn("seq", lit(0L))

  private def commit(root: String, id: Long, a: DataFrame, b: DataFrame,
      extra: Seq[TableGroup.TableBatch] = Nil): Unit = {
    TableGroup.commit(spark, root,
      Seq(TableGroup.TableBatch("ta", a, Seq("key")),
        TableGroup.TableBatch("tb", b, Seq("key"))) ++ extra,
      Seq("lsn", "seq"), batchId = id, numBuckets = 2)
    ()
  }

  /** Drive the source with a foreachBatch collector so per-micro-batch
    * boundaries stay observable (the consistency property lives at batch
    * granularity, which a memory sink erases).
    */
  private def collector(root: String, ckpt: String,
      out: scala.collection.mutable.Map[Long, Seq[(String, String, String)]])
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft-group-cdf").load(root)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        out.synchronized {
          out(id) = batch.select("table", "op", "key")
            .as[(String, String, String)].collect().toSeq
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()

  test("batches are cross-table consistent per root commit; no backfill; restart resumes") {
    withRetain(6) {
      val dir = java.nio.file.Files.createTempDirectory("ggcdf1").toString
      val root = s"$dir/g"
      val ckpt = s"$dir/ck"
      commit(root, 1L, rows(("insert", "a", 1L, 10L)),
        rows(("insert", "x", 1L, 100L)))
      val got = scala.collection.mutable.Map
        .empty[Long, Seq[(String, String, String)]]
      val q = collector(root, ckpt, got)
      try {
        q.processAllAvailable()
        assert(got.values.flatten.isEmpty, "v1 existed at start — no backfill")
        // one group commit touching BOTH members → ONE batch carrying both
        commit(root, 2L,
          rows(("update", "a", 2L, 11L), ("insert", "b", 3L, 20L)),
          rows(("delete", "x", 2L, 0L)))
        q.processAllAvailable()
        val batch2 = got.values.filter(_.nonEmpty).toSeq
        assert(batch2.size == 1, s"one root commit → one non-empty batch: $got")
        assert(batch2.head.toSet == Set(
          ("ta", "update", """{"key":"a"}"""),
          ("ta", "insert", """{"key":"b"}"""),
          ("tb", "delete", """{"key":"x"}""")),
          "both members' changes must land in the SAME batch (root granularity)")
      } finally q.stop()
      // restart from the checkpoint: only the NEXT root commit arrives
      got.clear()
      val q2 = collector(root, ckpt, got)
      try {
        q2.processAllAvailable()
        assert(got.values.flatten.isEmpty, "nothing re-delivered on restart")
        commit(root, 3L, rows(("delete", "b", 4L, 0L)),
          rows(("insert", "y", 4L, 200L)))
        q2.processAllAvailable()
        assert(got.values.flatten.toSet == Set(
          ("ta", "delete", """{"key":"b"}"""),
          ("tb", "insert", """{"key":"y"}""")))
      } finally q2.stop()
    }
  }

  test("a member joining mid-stream bootstraps as its full snapshot of inserts") {
    withRetain(6) {
      val dir = java.nio.file.Files.createTempDirectory("ggcdf2").toString
      val root = s"$dir/g"
      commit(root, 1L, rows(("insert", "a", 1L, 10L)),
        rows(("insert", "x", 1L, 100L)))
      val got = scala.collection.mutable.Map
        .empty[Long, Seq[(String, String, String)]]
      val q = collector(root, s"$dir/ck", got)
      try {
        q.processAllAvailable()
        commit(root, 2L, rows(("insert", "b", 2L, 20L)),
          rows(("insert", "y", 2L, 200L)),
          extra = Seq(TableGroup.TableBatch("tc",
            rows(("insert", "m", 2L, 1L), ("insert", "n", 2L, 2L)),
            Seq("key"))))
        q.processAllAvailable()
        val all = got.values.flatten.toSet
        assert(all.filter(_._1 == "tc") == Set(
          ("tc", "insert", """{"key":"m"}"""),
          ("tc", "insert", """{"key":"n"}""")),
          "new member's whole state arrives as inserts in the joining batch")
        assert(all.filter(_._1 == "ta") == Set(("ta", "insert", """{"key":"b"}""")))
      } finally q.stop()
    }
  }

  test("add-column evolution flows through the GROUP feed: new column one-sided in the JSON envelope") {
    withRetain(6) {
      val dir = java.nio.file.Files.createTempDirectory("ggcdf4").toString
      val root = s"$dir/g"
      commit(root, 1L, rows(("insert", "a", 1L, 10L)), rows())
      val sink = s"ggcdf_${java.util.UUID.randomUUID().toString.take(8)}"
      val q = spark.readStream.format("graft-group-cdf").load(root)
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", s"$dir/ck").start()
      try {
        q.processAllAvailable()
        // the widened batch: member ta gains column w mid-stream
        val widened = Seq(("update", "a", 2L, 11L, "W1"), ("insert", "b", 3L, 20L, "W2"))
          .toDF("op", "key", "lsn", "v", "w").withColumn("seq", lit(0L))
        TableGroup.commit(spark, root,
          Seq(TableGroup.TableBatch("ta", widened, Seq("key")),
            TableGroup.TableBatch("tb", rows(), Seq("key"))),
          Seq("lsn", "seq"), batchId = 2L, numBuckets = 2)
        q.processAllAvailable()
        val t = spark.table(sink)
          .select(col("key"), col("op"),
            get_json_object(col("before"), "$.w").as("bw"),
            get_json_object(col("after"), "$.w").as("aw"))
          .as[(String, String, Option[String], Option[String])].collect().toSet
        // a's before predates the widening (w null → omitted from the
        // JSON); both afters carry the new column — the union-payload
        // contract surviving the envelope encoding
        assert(t == Set(
          ("""{"key":"a"}""", "update", None, Some("W1")),
          ("""{"key":"b"}""", "insert", None, Some("W2"))))
      } finally q.stop()
    }
  }

  test("a start offset pruned past retention fails LOUDLY, never silently emits a wrong diff") {
    withRetain(6) {
      val dir = java.nio.file.Files.createTempDirectory("ggcdf5").toString
      val root = s"$dir/g"
      commit(root, 1L, rows(("insert", "a", 1L, 10L)), rows())
      commit(root, 2L, rows(("update", "a", 2L, 11L)), rows())
      val src = new GraftGroupCdfSource(spark.sqlContext, root)
      // simulate a subscriber lagging past the retention horizon: its
      // checkpointed start version's manifest is gone (vacuum). The diff
      // must THROW when forced — answering from a different snapshot
      // would silently corrupt the replica.
      assert(new java.io.File(s"$root/ta/_graft_manifest.v1.json").delete())
      val stale = org.apache.spark.sql.execution.streaming.runtime
        .SerializedOffset("""{"lastBatchId":1,"tables":{"ta":1,"tb":1}}""")
      val end = org.apache.spark.sql.execution.streaming.runtime
        .SerializedOffset("""{"lastBatchId":2,"tables":{"ta":2,"tb":2}}""")
      intercept[Exception] {
        org.apache.spark.sql.GraftShims.asBatchDataFrame(
          src.getBatch(Some(stale), end)).collect()
      }
    }
  }

  test("lagging subscriber across a writer vacuum: in-retention catch-up is the exact net diff; past-retention resume fails LOUDLY") {
    // Part A — subscriber pauses 3 commits, writer vacuums, retention
    // covers the lag: the resumed stream delivers ONE catch-up batch that
    // is the NET v1→v4 diff (intermediate states collapsed), bit-correct.
    withRetain(6) {
      val dir = java.nio.file.Files.createTempDirectory("ggcdf6").toString
      val root = s"$dir/g"
      commit(root, 1L, rows(("insert", "a", 1L, 10L)), rows())
      val got = scala.collection.mutable.Map
        .empty[Long, Seq[(String, String, String)]]
      val q = collector(root, s"$dir/ck", got)
      try q.processAllAvailable() finally q.stop() // subscriber goes DOWN
      got.clear()
      commit(root, 2L, rows(("update", "a", 2L, 11L)), rows())
      commit(root, 3L, rows(("insert", "b", 3L, 20L)), rows())
      commit(root, 4L, rows(("delete", "a", 4L, 0L),
        ("update", "b", 4L, 21L)), rows())
      TableGroup.vacuum(spark, root) // retention covers the lag — no-op risk
      val q2 = collector(root, s"$dir/ck", got)
      try {
        q2.processAllAvailable()
        val nonEmpty = got.filter(_._2.nonEmpty)
        assert(nonEmpty.size == 1,
          s"catch-up arrives as ONE collapsed batch: $got")
        // net of (update a, insert b, delete a, update b): a deleted, b at 21
        assert(nonEmpty.values.head.toSet == Set(
          ("ta", "delete", """{"key":"a"}"""),
          ("ta", "insert", """{"key":"b"}""")))
        // the collapsed insert must carry the FINAL payload, not v3's
        val src = new GraftGroupCdfSource(spark.sqlContext, root)
        val o = (v: Long) => org.apache.spark.sql.execution.streaming.runtime
          .SerializedOffset(s"""{"lastBatchId":$v,"tables":{"ta":$v,"tb":$v}}""")
        val net = org.apache.spark.sql.GraftShims.asBatchDataFrame(
            src.getBatch(Some(o(1L)), o(4L)))
          .filter(col("op") === "insert")
          .select(get_json_object(col("after"), "$.v").cast("long"))
          .as[Long].collect().toSeq
        assert(net == Seq(21L), "collapsed insert carries the final payload")
      } finally q2.stop()
    }
    // Part B — the lag EXCEEDS retention and the writer vacuums the start
    // version away: the resumed stream must throw, and deliver NOTHING —
    // a silent wrong diff is the one forbidden outcome.
    withRetain(2) {
      val dir = java.nio.file.Files.createTempDirectory("ggcdf7").toString
      val root = s"$dir/g"
      commit(root, 1L, rows(("insert", "a", 1L, 10L)), rows())
      val got = scala.collection.mutable.Map
        .empty[Long, Seq[(String, String, String)]]
      val q = collector(root, s"$dir/ck", got)
      try q.processAllAvailable() finally q.stop() // down...
      got.clear()
      (2L to 5L).foreach(i =>
        commit(root, i, rows(("update", "a", i, 10L + i)), rows()))
      TableGroup.vacuum(spark, root) // ...and the lag outruns retention
      assert(!new java.io.File(s"$root/ta/_graft_manifest.v1.json").exists(),
        "drill premise: the subscriber's start version IS pruned")
      val q2 = collector(root, s"$dir/ck", got)
      try {
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q2.processAllAvailable()
        }
        assert(got.values.flatten.isEmpty,
          s"no envelope may be delivered from a pruned-past start: $got")
      } finally q2.stop()
    }
  }

  test("envelope payloads: before/after JSON with insert/delete one-sidedness") {
    withRetain(6) {
      val dir = java.nio.file.Files.createTempDirectory("ggcdf3").toString
      val root = s"$dir/g"
      commit(root, 1L, rows(("insert", "a", 1L, 10L)), rows())
      val sink = s"ggcdf_${java.util.UUID.randomUUID().toString.take(8)}"
      val q = spark.readStream.format("graft-group-cdf").load(root)
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", s"$dir/ck").start()
      try {
        q.processAllAvailable()
        commit(root, 2L,
          rows(("update", "a", 2L, 11L), ("insert", "b", 3L, 20L)), rows())
        q.processAllAvailable()
        commit(root, 3L, rows(("delete", "a", 4L, 0L)), rows())
        q.processAllAvailable()
        val t = spark.table(sink)
          .select(col("key"), col("op"),
            get_json_object(col("before"), "$.v").cast("long").as("bv"),
            get_json_object(col("after"), "$.v").cast("long").as("av"))
          .as[(String, String, Option[Long], Option[Long])].collect().toSet
        // drained per commit: update carries both sides, insert after-only,
        // delete before-only — the one-sided envelope contract
        assert(t == Set(
          ("""{"key":"a"}""", "update", Some(10L), Some(11L)),
          ("""{"key":"b"}""", "insert", None, Some(20L)),
          ("""{"key":"a"}""", "delete", Some(11L), None)))
      } finally q.stop()
    }
  }

  test("writer crash mid-transaction WHILE a subscriber is live: the torn state is never observed; the retry delivers the full window once") {
    // cdc56's crash (some member merges landed, root never swapped)
    // composed with cdc66's live subscription — the one interleaving of
    // the flagship loop no gate drives: the subscriber must stay silent
    // through the torn window (a member table individually ahead is
    // invisible through the group face) and then receive the retried
    // transaction as ONE cross-table-consistent batch, exactly once.
    withRetain(6) {
      val dir = java.nio.file.Files.createTempDirectory("ggcdf5").toString
      val root = s"$dir/g"
      commit(root, 1L, rows(("insert", "a", 1L, 10L)),
        rows(("insert", "x", 1L, 100L)))
      val got = scala.collection.mutable.Map
        .empty[Long, Seq[(String, String, String)]]
      val q = collector(root, s"$dir/ck", got)
      try {
        q.processAllAvailable()
        assert(got.values.flatten.isEmpty, "no backfill")
        // CRASH: transaction 2 lands on member ta only — the root never
        // swaps (TableGroup.commit died between member merges)
        graft.cdc.MaterializedTable.merge(spark, s"$root/ta",
          rows(("update", "a", 2L, 11L)), Seq("key"), Seq("lsn", "seq"),
          numBuckets = 2, batchId = Some(2L))
        q.processAllAvailable()
        assert(got.values.flatten.isEmpty,
          "the subscriber must NEVER observe the torn mid-transaction state")
        // WRITER RETRY of the same transaction: ta's merge replays as a
        // batch-id-guarded no-op, tb's folds, the root swaps
        commit(root, 2L, rows(("update", "a", 2L, 11L)),
          rows(("insert", "y", 2L, 200L)))
        q.processAllAvailable()
        val windows = got.values.filter(_.nonEmpty).toSeq
        assert(windows.size == 1,
          s"the retried transaction arrives as exactly ONE batch: $got")
        assert(windows.head.toSet == Set(
          ("ta", "update", """{"key":"a"}"""),
          ("tb", "insert", """{"key":"y"}""")),
          "the batch carries BOTH members' changes — including the member " +
            "that landed before the crash — exactly once")
      } finally q.stop()
    }
  }

  test("a member present at the window start but absent from its end root fails LOUDLY — shrunk group, never a silent drop") {
    withRetain(4) {
      val dir = java.nio.file.Files.createTempDirectory("ggcdf4").toString
      val root = s"$dir/g"
      commit(root, 1L, rows(("insert", "a", 1L, 10L)),
        rows(("insert", "x", 1L, 100L)))
      commit(root, 2L, rows(("update", "a", 2L, 11L)), rows())
      val src = new GraftGroupCdfSource(spark.sqlContext, root)
      import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
      val to = src.getOffset.get.json
      // a from-offset claiming a member the end root no longer has
      val from = to.replaceFirst("""\{"ta"""", """{"gone":1,"ta"""")
        .replaceFirst(""""lastBatchId":2""", """"lastBatchId":1""")
      val e = intercept[IllegalStateException] {
        src.getBatch(Some(SerializedOffset(from)), SerializedOffset(to))
      }
      assert(e.getMessage.contains("gone") &&
        e.getMessage.contains("absent from its end root"), e.getMessage)
    }
  }
}
