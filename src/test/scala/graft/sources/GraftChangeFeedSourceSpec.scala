package graft.sources

import graft.SparkTestSession
import graft.cdc.MaterializedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graft-cdf streaming source: versions as offsets, change feed as
  * micro-batches.
  */
class GraftChangeFeedSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withRetain[A](n: Int)(f: => A): A = {
    spark.conf.set("spark.graft.materialized.retainVersions", n.toString)
    try f finally spark.conf.unset("spark.graft.materialized.retainVersions")
  }

  private def mergeBatch(dir: String, id: Long,
      rows: (String, String, Long, Long)*): Unit =
    MaterializedTable.merge(spark, dir,
      rows.toSeq.toDF("op", "key", "lsn", "v")
        .withColumn("seq", lit(0L)),
      Seq("key"), Seq("lsn", "seq"), numBuckets = 4, batchId = Some(id),
      statsCols = Nil)

  test("no backfill; per-commit drives emit exactly the per-version diffs; replays drain silent") {
    withRetain(6) {
      val dir = java.nio.file.Files.createTempDirectory("gcdf1").toString + "/t"
      mergeBatch(dir, 1L, ("insert", "a", 1L, 10L), ("insert", "b", 2L, 20L))

      val sink = s"gcdf_${java.util.UUID.randomUUID().toString.take(8)}"
      val q = spark.readStream.format("graft-cdf").load(dir)
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("gcdf_ck").toString)
        .start()
      try {
        q.processAllAvailable()
        // v1 existed at start — NO backfill
        assert(spark.table(sink).count() == 0)

        // commit v2, drain: its diff arrives
        mergeBatch(dir, 2L, ("update", "a", 3L, 11L), ("insert", "c", 4L, 30L))
        q.processAllAvailable()
        val afterV2 = spark.table(sink)
          .select("key", "op", "before_v", "after_v")
          .as[(String, String, Option[Long], Option[Long])].collect().toSet
        assert(afterV2 == Set(
          ("a", "update", Some(10L), Some(11L)),
          ("c", "insert", None, Some(30L))))

        // commit v3 with a delete, drain
        mergeBatch(dir, 3L, ("delete", "b", 5L, 0L))
        q.processAllAvailable()
        val v3 = spark.table(sink).filter(col("op") === "delete")
          .select("key", "before_v", "after_v")
          .as[(String, Option[Long], Option[Long])].collect().toSet
        assert(v3 == Set(("b", Some(20L), None)))

        // nothing new: drain again, no extra rows
        val n = spark.table(sink).count()
        q.processAllAvailable()
        assert(spark.table(sink).count() == n)
      } finally q.stop()
    }
  }

  test("a restart batch spanning several commits emits the NET per-key change") {
    withRetain(10) {
      val dir = java.nio.file.Files.createTempDirectory("gcdf2").toString + "/t"
      val ckpt = java.nio.file.Files.createTempDirectory("gcdf_ck2").toString
      mergeBatch(dir, 1L, ("insert", "a", 1L, 10L), ("insert", "b", 2L, 20L))
      val first = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Option[Long], Option[Long])]
      val q1 = spark.readStream.format("graft-cdf").load(dir)
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            first ++= b.select("key", "op", "before_v", "after_v")
              .as[(String, String, Option[Long], Option[Long])].collect()
            ()
        }
        .option("checkpointLocation", ckpt).start()
      try {
        q1.processAllAvailable()
        mergeBatch(dir, 2L, ("update", "a", 3L, 999L), ("update", "b", 4L, 21L))
        q1.processAllAvailable() // commits offset v2
      } finally q1.stop()
      assert(first.size == 2)

      // THREE commits land while the query is DOWN: the restart drains them
      // as ONE batch whose rows are each key's NET change — b's 22 and 23
      // never emit; a's v reverts to 10 (its lsn payload still advances, so
      // a emits an update whose v happens to round-trip)
      mergeBatch(dir, 3L, ("update", "a", 5L, 10L), ("update", "b", 6L, 22L))
      mergeBatch(dir, 4L, ("update", "b", 7L, 23L))
      mergeBatch(dir, 5L, ("update", "b", 8L, 24L))
      // the memory sink cannot recover a checkpoint — restart into
      // foreachBatch, accumulating on the driver
      val got = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Option[Long], Option[Long])]
      val q2 = spark.readStream.format("graft-cdf").load(dir)
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            got ++= b.select("key", "op", "before_v", "after_v")
              .as[(String, String, Option[Long], Option[Long])].collect()
            ()
        }
        .option("checkpointLocation", ckpt).start()
      try q2.processAllAvailable() finally q2.stop()
      assert(got.toSet == Set(
        ("a", "update", Some(999L), Some(10L)),
        ("b", "update", Some(21L), Some(24L))), s"got $got")
    }
  }

  test("restart from checkpoint resumes at the committed offset (no re-emission)") {
    withRetain(8) {
      val dir = java.nio.file.Files.createTempDirectory("gcdf3").toString + "/t"
      val ckpt = java.nio.file.Files.createTempDirectory("gcdf_ck3").toString
      mergeBatch(dir, 1L, ("insert", "a", 1L, 10L))
      def run(into: scala.collection.mutable.ArrayBuffer[Option[Long]])(
          body: org.apache.spark.sql.streaming.StreamingQuery => Unit): Unit = {
        val q = spark.readStream.format("graft-cdf").load(dir)
          .writeStream.foreachBatch {
            (b: org.apache.spark.sql.DataFrame, _: Long) =>
              into ++= b.select("after_v").as[Option[Long]].collect()
              ()
          }
          .option("checkpointLocation", ckpt).start()
        try body(q) finally q.stop()
      }
      val first = scala.collection.mutable.ArrayBuffer.empty[Option[Long]]
      run(first) { q =>
        q.processAllAvailable()
        mergeBatch(dir, 2L, ("update", "a", 2L, 11L))
        q.processAllAvailable()
      }
      assert(first.toSeq == Seq(Some(11L)))
      // restart with the SAME checkpoint after one more commit: only the
      // new diff arrives
      mergeBatch(dir, 3L, ("update", "a", 3L, 12L))
      val second = scala.collection.mutable.ArrayBuffer.empty[Option[Long]]
      run(second)(_.processAllAvailable())
      assert(second.toSeq == Seq(Some(12L)),
        s"expected only v2→v3's diff, got $second")
    }
  }

  test("mid-stream ADD-column evolution: the query fails LOUDLY; a restart from the SAME checkpoint resumes widened, no rows lost or doubled") {
    // the reference survives ALTER TABLE mid-stream end-to-end
    // (spec/functional/topic_spec.rb:232–274); here the operational path is
    // evolve → the running query throws (a pinned typed projection must
    // never silently reshape) → restart same checkpoint → the interrupted
    // window replays IN FULL under the widened schema
    withRetain(8) {
      val dir = java.nio.file.Files.createTempDirectory("gcdf5").toString + "/t"
      val ckpt = java.nio.file.Files.createTempDirectory("gcdf_ck5").toString
      mergeBatch(dir, 1L, ("insert", "a", 1L, 10L))
      val got = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Option[Long], Option[String])]
      def run(widened: Boolean)(
          body: org.apache.spark.sql.streaming.StreamingQuery => Unit): Unit = {
        val q = spark.readStream.format("graft-cdf").load(dir)
          .writeStream.foreachBatch {
            (b: org.apache.spark.sql.DataFrame, _: Long) =>
              val withW =
                if (widened) b.toDF()
                else b.withColumn("after_w", lit(null).cast("string"))
              got ++= withW.select("key", "op", "after_v", "after_w")
                .as[(String, String, Option[Long], Option[String])].collect()
              ()
          }
          .option("checkpointLocation", ckpt).start()
        try body(q) finally q.stop()
      }
      // phase 1: pre-evolution traffic flows; then the table WIDENS (new
      // payload column w lands via a merge) and the next batch must fail
      // loudly instead of silently dropping w from the feed
      val failure = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        run(widened = false) { q =>
          q.processAllAvailable()
          mergeBatch(dir, 2L, ("update", "a", 2L, 11L))
          q.processAllAvailable()
          assert(got.toSeq == Seq(("a", "update", Some(11L), None)))
          // EVOLVE: same key layout, payload gains w
          MaterializedTable.merge(spark, dir,
            Seq(("insert", "b", 3L, 30L, "W")).toDF("op", "key", "lsn", "v", "w")
              .withColumn("seq", lit(0L)),
            Seq("key"), Seq("lsn", "seq"), numBuckets = 4, batchId = Some(3L))
          q.processAllAvailable()
          q.awaitTermination()
        }
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(failure).exists(_.getMessage != null)
        && chain(failure).map(_.getMessage).filter(_ != null)
          .exists(m => m.contains("evolved mid-stream") && m.contains("after_w")),
        s"expected the loud evolution error, got: $failure")
      // phase 2: restart from the SAME checkpoint — the new source instance
      // pins the WIDENED schema and the interrupted window replays in full:
      // exactly the v2→v3 diff, with w's value visible, nothing doubled
      run(widened = true)(_.processAllAvailable())
      assert(got.toSeq.drop(1) == Seq(("b", "insert", Some(30L), Some("W"))),
        s"restart must deliver exactly the interrupted window widened: $got")
      // and the feed keeps flowing with the widened schema
      MaterializedTable.merge(spark, dir,
        Seq(("update", "b", 4L, 31L, "W2")).toDF("op", "key", "lsn", "v", "w")
          .withColumn("seq", lit(0L)),
        Seq("key"), Seq("lsn", "seq"), numBuckets = 4, batchId = Some(4L))
      run(widened = true)(_.processAllAvailable())
      assert(got.toSeq.drop(2) == Seq(("b", "update", Some(31L), Some("W2"))))
    }
  }

  test("mid-stream DROP (schema rollback): loud guided kill once the window narrows; same-checkpoint restart replays the interrupted window under the NARROWED schema, no rows lost or doubled") {
    // the other half of the ADD pin (the reference churns ALTER both ways —
    // spec/functional/topic_spec.rb:232–274). In this storage layer merges
    // only WIDEN (union-by-name); the narrowing path is restore(): an
    // operator rolls the table back before the column existed, and from the
    // first window whose BOTH endpoints are narrow the feed has no w —
    // the source must refuse with restart guidance, not a bare
    // AnalysisException from its pinned projection.
    withRetain(10) {
      val dir = java.nio.file.Files.createTempDirectory("gcdf6").toString + "/t"
      val ckpt = java.nio.file.Files.createTempDirectory("gcdf_ck6").toString
      def mergeW(id: Long, rows: (String, String, Long, Long, String)*): Unit =
        MaterializedTable.merge(spark, dir,
          rows.toSeq.toDF("op", "key", "lsn", "v", "w")
            .withColumn("seq", lit(0L)),
          Seq("key"), Seq("lsn", "seq"), numBuckets = 4, batchId = Some(id))
      mergeBatch(dir, 1L, ("insert", "a", 1L, 10L))          // v1: narrow era
      mergeW(2L, ("insert", "b", 2L, 20L, "W"))              // v2: widened
      val wide = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Option[Long], Option[String])]
      def runWide(body: org.apache.spark.sql.streaming.StreamingQuery => Unit)
          : Unit = {
        val q = spark.readStream.format("graft-cdf").load(dir)
          .writeStream.foreachBatch {
            (b: org.apache.spark.sql.DataFrame, _: Long) =>
              wide ++= b.select("key", "op", "after_v", "after_w")
                .as[(String, String, Option[Long], Option[String])].collect()
              ()
          }
          .option("checkpointLocation", ckpt).start()
        try body(q) finally q.stop()
      }
      val failure = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        runWide { q =>
          q.processAllAvailable()
          mergeW(3L, ("update", "b", 3L, 21L, "W2"))
          q.processAllAvailable()
          assert(wide.toSeq == Seq(("b", "update", Some(21L), Some("W2"))))
          // DROP: roll the schema back to the narrow era (v4 = v1 content,
          // v1 schema). The restore window itself still flows — w rides the
          // BEFORE side — and delivers b's retraction wide...
          MaterializedTable.restore(spark, dir, 1L)
          q.processAllAvailable()
          assert(wide.toSeq.drop(1) == Seq(("b", "delete", None, None)))
          // ...but the first fully-narrow window must kill the query loudly
          mergeBatch(dir, 5L, ("insert", "c", 10L, 30L))
          q.processAllAvailable()
          q.awaitTermination()
        }
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(failure).map(_.getMessage).filter(_ != null)
        .exists(m => m.contains("narrowed mid-stream") && m.contains("after_w")),
        s"expected the guided narrowing error, got: $failure")
      // restart from the SAME checkpoint: the new source pins the NARROWED
      // schema and the interrupted window replays in full — exactly c's
      // insert, nothing doubled from the committed wide windows
      val narrow = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Option[Long])]
      def runNarrow(): Unit = {
        val q = spark.readStream.format("graft-cdf").load(dir)
          .writeStream.foreachBatch {
            (b: org.apache.spark.sql.DataFrame, _: Long) =>
              assert(!b.columns.contains("after_w"),
                "restarted source must pin the narrowed schema")
              narrow ++= b.select("key", "op", "after_v")
                .as[(String, String, Option[Long])].collect()
              ()
          }
          .option("checkpointLocation", ckpt).start()
        try q.processAllAvailable() finally q.stop()
      }
      runNarrow()
      assert(narrow.toSeq == Seq(("c", "insert", Some(30L))),
        s"restart must deliver exactly the interrupted window narrowed: $narrow")
      // and the feed keeps flowing narrow
      mergeBatch(dir, 6L, ("update", "c", 11L, 31L))
      runNarrow()
      assert(narrow.toSeq.drop(1) == Seq(("c", "update", Some(31L))))
    }
  }

  test("mid-stream RENAME churn: loud kill at the new name; restart replays with the old column's history on the BEFORE side and the new name carrying forward") {
    // a rename in this layer is additive (union-by-name keeps the old
    // column, null from the rename on): the running query dies on the NEW
    // name via the ADD guard, and the restarted query sees the renamed
    // row's history bridged — before_v holds the pre-rename value,
    // after_v2 the post-rename one (topic_spec.rb:232–274's rename churn,
    // expressed in this storage layer's widen-only schema algebra)
    withRetain(8) {
      val dir = java.nio.file.Files.createTempDirectory("gcdf7").toString + "/t"
      val ckpt = java.nio.file.Files.createTempDirectory("gcdf_ck7").toString
      mergeBatch(dir, 1L, ("insert", "a", 1L, 10L))
      val got = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Option[Long], Option[Long])]
      val failure = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        val q = spark.readStream.format("graft-cdf").load(dir)
          .writeStream.foreachBatch {
            (b: org.apache.spark.sql.DataFrame, _: Long) =>
              got ++= b.select("key", "op", "before_v", "after_v")
                .as[(String, String, Option[Long], Option[Long])].collect()
              ()
          }
          .option("checkpointLocation", ckpt).start()
        try {
          q.processAllAvailable()
          // RENAME v → v2: the batch writes v2 only
          MaterializedTable.merge(spark, dir,
            Seq(("update", "a", 2L, 11L)).toDF("op", "key", "lsn", "v2")
              .withColumn("seq", lit(0L)),
            Seq("key"), Seq("lsn", "seq"), numBuckets = 4, batchId = Some(2L))
          q.processAllAvailable()
          q.awaitTermination()
        } finally q.stop()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(failure).map(_.getMessage).filter(_ != null)
        .exists(m => m.contains("evolved mid-stream") && m.contains("v2")),
        s"expected the loud evolution error on the renamed column: $failure")
      assert(got.isEmpty, "no rows may land before the rename kill")
      // restart: widened pin; the interrupted window replays once, with the
      // rename bridged across before/after
      val after = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Option[Long], Option[Long], Option[Long])]
      val q2 = spark.readStream.format("graft-cdf").load(dir)
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            after ++= b.select("key", "op", "before_v", "after_v", "after_v2")
              .as[(String, String, Option[Long], Option[Long], Option[Long])]
              .collect()
            ()
        }
        .option("checkpointLocation", ckpt).start()
      try q2.processAllAvailable() finally q2.stop()
      assert(after.toSeq ==
        Seq(("a", "update", Some(10L), None, Some(11L))),
        s"rename-churn replay diverged: $after")
    }
  }

  test("an offset regression (batch start > end) fails LOUDLY — a rolled-back table or repointed source, never a silent empty batch") {
    withRetain(4) {
      val dir = java.nio.file.Files.createTempDirectory("gcdf4").toString + "/t"
      mergeBatch(dir, 1L, ("insert", "a", 1L, 10L))
      mergeBatch(dir, 2L, ("update", "a", 2L, 11L))
      val src = new GraftCdfSource(spark.sqlContext, dir, "")
      import org.apache.spark.sql.execution.streaming.runtime.LongOffset
      // from == to stays the empty no-op (fresh query's replayed batch 0)
      assert(org.apache.spark.sql.GraftShims.asBatchDataFrame(
        src.getBatch(Some(LongOffset(2L)), LongOffset(2L))).isEmpty)
      val e = intercept[IllegalStateException] {
        src.getBatch(Some(LongOffset(2L)), LongOffset(1L))
      }
      assert(e.getMessage.contains("offset regression"), e.getMessage)
    }
  }
}
