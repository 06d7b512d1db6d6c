package graft.cdc

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 history + incremental aggregate maintenance over handcrafted
  * changelogs covering every transition: insert, value-update, regroup,
  * delete, first-event tombstone, post-delete resurrect.
  */
/** Payload parsers for the streaming test — top-level so the closures shipped
  * to executors don't capture the (non-serializable) suite instance.
  */
object HistorySpec {
  private val G = """"g":"([^"]*)"""".r
  private val V = """"v":([-0-9.]+)""".r
  def gOf(e: CdcEvent): String =
    G.findFirstMatchIn(e.after).map(_.group(1)).orNull
  def vOf(e: CdcEvent): Option[BigDecimal] =
    V.findFirstMatchIn(Option(e.after).getOrElse(""))
      .map(m => BigDecimal(m.group(1)).setScale(4))
}

class HistorySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(op: String, key: String, lsn: Long, value: Double = 0.0,
      grp: String = null): CdcEvent =
    CdcEvent(op, "public.t", lsn, lsn / 10, 0L, key,
      before = null,
      after = if (op == Op.Delete) null
        else s"""{"g":"$grp","v":$value}""")

  private val changelog = Seq(
    ev(Op.Insert, "u1", 1, 10.0, "A"),
    ev(Op.Update, "u1", 3, 15.0, "A"),   // value update within group
    ev(Op.Update, "u1", 6, 15.0, "B"),   // REGROUP A→B
    ev(Op.Insert, "u2", 2, 5.0, "A"),
    ev(Op.Delete, "u2", 4),              // delete
    ev(Op.Insert, "u3", 2, 7.0, "B"),
    ev(Op.Delete, "u4", 1),              // tombstone for never-seen key
    ev(Op.Insert, "u5", 1, 3.0, "A"),
    ev(Op.Delete, "u5", 2),
    ev(Op.Insert, "u5", 5, 4.0, "A"),    // post-delete resurrect
    ev(Op.Insert, "u6", 1, 9.0, "C"),
    ev(Op.Delete, "u6", 3)               // group C fully retracted
  )

  test("ScdHistory stamps validity intervals; deletes close without opening") {
    val hist = ScdHistory.batch(changelog.toDF(), Seq("table", "key"), Seq("lsn", "seq"))
      .select($"key", $"lsn", $"valid_to.lsn".as("to_lsn"), $"is_current")
      .as[(String, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(hist == Set(
      ("u1", 1L, Some(3L), false),
      ("u1", 3L, Some(6L), false),
      ("u1", 6L, None, true),
      ("u2", 2L, Some(4L), false),       // closed by the delete, no open version
      ("u3", 2L, None, true),
      ("u5", 1L, Some(2L), false),
      ("u5", 5L, None, true),            // resurrect opens a fresh interval
      ("u6", 1L, Some(3L), false)))
    // u4 (tombstone only) contributes no version at all
  }

  test("foldHistory + openVersions reconstruct the batch history; batch retries are idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_fold").toString + "/hist"
    val input = MemoryStream[CdcEvent]
    var lastBatch: (Long, org.apache.spark.sql.DataFrame) = null
    // a fresh (never-written) history must read as empty, not throw — the
    // first micro-batches of a new pipeline close nothing
    assert(ScdHistory.readHistory(spark, dir).count() == 0)
    val q = ScdHistory.streamingClosedVersions(input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (closed: org.apache.spark.sql.Dataset[ClosedVersion], id: Long) =>
        val df = closed.toDF().localCheckpoint()
        lastBatch = (id, df)
        ScdHistory.foldHistory(spark, dir, df, id)
      }
      .start()
    try {
      val (b1, b2) = changelog.splitAt(6)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      // simulate a foreachBatch RETRY of the last micro-batch (at-least-once
      // sink contract): same batch id, same rows — must not double-append
      val before = ScdHistory.readHistory(spark, dir).count()
      ScdHistory.foldHistory(spark, dir, lastBatch._2, lastBatch._1)
      assert(ScdHistory.readHistory(spark, dir).count() == before,
        "a retried batch must overwrite its own partition, not append")

      // closed (folded) ∪ open (from compacted latest state) == batch operator
      val open = ScdHistory.openVersions(
        LatestState.batch(changelog.toDF(), Seq("table", "key"), Seq("lsn", "seq")))
      val got = ScdHistory.readHistory(spark, dir).unionByName(open)
        .select($"key", $"valid_from_lsn", $"valid_to_lsn")
        .as[(String, Long, Option[Long])].collect().toSet
      val want = ScdHistory.batch(changelog.toDF(), Seq("table", "key"), Seq("lsn", "seq"))
        .select($"key", $"lsn", $"valid_to.lsn")
        .as[(String, Long, Option[Long])].collect().toSet
      assert(got == want)
    } finally q.stop()
  }

  test("foldToHistory bounded drive over a file stream: closed ∪ open ≡ batch") {
    val root = java.nio.file.Files.createTempDirectory("scd2drive").toString
    val src = root + "/src"
    changelog.toDF().coalesce(1).write.parquet(src)
    val stream = spark.readStream.schema(changelog.toDF().schema)
      .parquet(src).as[CdcEvent]
    val histDir = root + "/hist"
    ScdHistory.foldToHistory(ScdHistory.streamingClosedVersions(stream), histDir)
    val open = ScdHistory.openVersions(
      LatestState.batch(changelog.toDF(), Seq("table", "key"), Seq("lsn", "seq")))
    val got = ScdHistory.readHistory(spark, histDir).unionByName(open)
      .select($"key", $"valid_from_lsn", $"valid_to_lsn")
      .as[(String, Long, Option[Long])].collect().toSet
    val want = ScdHistory.batch(changelog.toDF(), Seq("table", "key"), Seq("lsn", "seq"))
      .select($"key", $"lsn", $"valid_to.lsn")
      .as[(String, Long, Option[Long])].collect().toSet
    assert(got == want)
  }

  test("streamingClosedVersions emits exactly the batch operator's closed intervals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[CdcEvent]
    val q = ScdHistory.streamingClosedVersions(input.toDS())
      .writeStream.format("memory").queryName("scd2_closed")
      .outputMode("append").start()
    try {
      val (b1, b2) = changelog.splitAt(6)
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2 ++ b1) // full replay of b1 — closed facts must not duplicate
      q.processAllAvailable()
      val streamed = spark.table("scd2_closed")
        .select($"key", $"valid_from_lsn", $"valid_to_lsn")
        .as[(String, Long, Long)].collect().toSeq.sorted
      val batchClosed = ScdHistory.batch(changelog.toDF(), Seq("table", "key"),
          Seq("lsn", "seq"))
        .filter($"valid_to".isNotNull)
        .select($"key", $"lsn", $"valid_to.lsn")
        .as[(String, Long, Long)].collect().toSeq.sorted
      assert(streamed == batchClosed)
    } finally q.stop()
  }

  private def runIncremental(df: org.apache.spark.sql.DataFrame) =
    IncrementalAgg.sumCount(df, Seq("table", "key"), Seq("lsn", "seq"),
      groupExpr = get_json_object($"after", "$.g"),
      valueExpr = get_json_object($"after", "$.v").cast("double"))

  test("IncrementalAgg delta algebra handles update/regroup/delete/resurrect") {
    val got = runIncremental(changelog.toDF())
      .as[(String, Long, Double)].collect().toSet
    // A: u5 resurrected at 4.0 (u1 regrouped away, u2 deleted)
    // B: u1 15.0 + u3 7.0; C fully retracted ⇒ absent
    assert(got == Set(("A", 1L, 4.0), ("B", 2L, 22.0)))
  }

  test("IncrementalAgg ≡ compact-then-aggregate on the real changelog") {
    val env = ChangelogGen.fromEvents(spark, "/root/testdata/sf0.001").toDF()
    val incremental = IncrementalAgg.sumCount(env, Seq("table", "key"), Seq("lsn", "seq"),
        groupExpr = get_json_object($"after", "$.event_type"),
        valueExpr = get_json_object($"after", "$.value").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    val recomputed = LatestState.batch(env, Seq("table", "key"), Seq("lsn", "seq"))
      .groupBy(get_json_object($"after", "$.event_type").as("grp"))
      .agg(count(lit(1)).as("n_live"),
        sum(get_json_object($"after", "$.value").cast("double")
          .cast("decimal(18,4)")).cast("double").as("sum_value"))
      .as[(String, Long, Double)].collect().toSet
    assert(incremental == recomputed)
  }

  test("deltasAgainstState: batch-by-batch fold against persisted state ≡ sumCount") {
    val env = ChangelogGen.fromEvents(spark, "/root/testdata/sf0.001").toDF()
      .select($"op", $"key", $"lsn", $"seq",
        get_json_object($"after", "$.event_type").as("grp_col"),
        get_json_object($"after", "$.value").cast("double").as("val_col"))
    val mx = env.agg(max($"lsn")).head().getLong(0)
    // uneven cuts so cross-batch delete/resurrect/regroup transitions occur
    val cuts = Seq(0L, mx / 5, mx / 2, 3 * mx / 4, mx + 1)
    val root = java.nio.file.Files.createTempDirectory("dvs").toString
    val (stateDir, standingDir) = (root + "/state", root + "/standing")
    var lastDeltas: org.apache.spark.sql.DataFrame = null
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      val b = env.filter($"lsn" >= lo && $"lsn" < hi).localCheckpoint()
      val prior =
        if (MaterializedTable.exists(spark, stateDir))
          MaterializedTable.read(spark, stateDir)
            .select("key", "grp_col", "val_col")
        else b.select("key", "grp_col", "val_col").limit(0)
      lastDeltas = IncrementalAgg.deltasAgainstState(prior, b, Seq("key"),
        Seq("lsn", "seq"), $"grp_col", $"val_col").localCheckpoint()
      IncrementalAgg.foldStandingBatch(spark, standingDir, lastDeltas,
        batchId = i.toLong)
      MaterializedTable.merge(spark, stateDir, b, Seq("key"), Seq("lsn", "seq"),
        batchId = Some(i.toLong))
    }
    def standing() = IncrementalAgg.readStanding(spark, standingDir)
      .select($"grp", $"n_live", $"sum_value".cast("double"))
      .as[(String, Long, Double)].collect().toSet
    val folded = standing()
    val direct = IncrementalAgg.sumCount(env, Seq("key"), Seq("lsn", "seq"),
      groupExpr = $"grp_col", valueExpr = $"val_col")
      .as[(String, Long, Double)].collect().toSet
    assert(folded == direct)
    // a retried fold of the last batch is a no-op (marker + manifest guard)
    IncrementalAgg.foldStandingBatch(spark, standingDir, lastDeltas,
      batchId = (cuts.size - 2).toLong)
    assert(standing() == direct, "retried batch fold must not double-count")
  }

  test("streamingDeltas ≡ batch deltas across micro-batches; replays are silent") {
    import HistorySpec.{gOf, vOf}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[CdcEvent]
    val q = IncrementalAgg.streamingDeltas(input.toDS(), gOf, vOf)
      .writeStream.format("memory").queryName("ivm_deltas")
      .outputMode("append").start()
    try {
      val (b1, b2) = changelog.splitAt(6)
      input.addData(b1)
      q.processAllAvailable()
      // second batch replays ALL of batch 1 (at-least-once delivery) — the
      // non-advancing events must emit no deltas, or every fold downstream
      // would double-count them
      input.addData(b2 ++ b1)
      q.processAllAvailable()
      val streamed = spark.table("ivm_deltas").as[AggDelta].collect().toSeq
        .map(d => (d.grp, d.dn, d.dv.map(_.toDouble).getOrElse(0.0))).sorted
      val batch = IncrementalAgg.deltaRows(changelog.toDF(), Seq("table", "key"),
          Seq("lsn", "seq"),
          groupExpr = get_json_object($"after", "$.g"),
          valueExpr = get_json_object($"after", "$.v").cast("double"))
        .as[(String, Long, Option[BigDecimal])].collect().toSeq
        .map(d => (d._1, d._2, d._3.map(_.toDouble).getOrElse(0.0))).sorted
      assert(streamed == batch)
      // and the folded standing aggregate matches the batch operator
      val folded = streamed.groupBy(_._1)
        .view.mapValues(ds => (ds.map(_._2).sum, ds.map(_._3).sum)).toMap
        .collect { case (g, (n, s)) if n > 0 => (g, n, s) }.toSet
      assert(folded == Set(("A", 1L, 4.0), ("B", 2L, 22.0)))
    } finally q.stop()
  }

  test("foldStanding maintains a queryable aggregate from the live stream") {
    import HistorySpec.{gOf, vOf}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_standing").toString
    def standing(): Set[(String, Long, Double)] =
      IncrementalAgg.readStanding(spark, dir)
        .select($"grp", $"n_live", $"sum_value".cast("double"))
        .as[(String, Long, Double)].collect().toSet
    val input = MemoryStream[CdcEvent]
    var lastBatch: (Long, org.apache.spark.sql.DataFrame) = null
    val q = IncrementalAgg.streamingDeltas(input.toDS(), gOf, vOf)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[AggDelta], id: Long) =>
        val df = batch.toDF().localCheckpoint()
        lastBatch = (id, df)
        IncrementalAgg.foldStandingBatch(spark, dir, df, id, numBuckets = 8); ()
      }
      .start()
    try {
      val (b1, b2) = changelog.splitAt(6)
      input.addData(b1)
      q.processAllAvailable()
      // after batch 1: u1 regrouped to B, u2 inserted+deleted (A nets to
      // zero and must NOT appear), u3 in B
      assert(standing() == Set(("B", 2L, 22.0)))
      input.addData(b2 ++ b1) // replay all of b1 — must not double-fold
      q.processAllAvailable()
      assert(standing() == Set(("A", 1L, 4.0), ("B", 2L, 22.0)))
      // the stream's standing table equals the batch operator over the
      // whole changelog
      val batchAgg = runIncremental(changelog.toDF())
        .as[(String, Long, Double)].collect().toSet
      assert(standing() == batchAgg)
      // foreachBatch BATCH retry (at-least-once sink contract): re-folding
      // the last batch with its id must be a marker-guarded no-op — without
      // the guard the deltas would double-count
      val n = IncrementalAgg.foldStandingBatch(spark, dir,
        lastBatch._2, lastBatch._1, numBuckets = 8)
      assert(n == 0 && standing() == batchAgg,
        "a retried batch id must not fold again")
      // marker pruning below the committed id keeps the guard for the id
      // that can still be retried
      assert(IncrementalAgg.pruneMarkers(spark, dir, lastBatch._1) >= 1)
      assert(IncrementalAgg.foldStandingBatch(spark, dir,
        lastBatch._2, lastBatch._1, numBuckets = 8) == 0,
        "the committed batch's own marker must survive pruning")
    } finally q.stop()
  }

  test("deltaRows nets to zero for a group whose every key is retracted") {
    val deltas = IncrementalAgg.deltaRows(changelog.toDF(), Seq("table", "key"),
        Seq("lsn", "seq"),
        groupExpr = get_json_object($"after", "$.g"),
        valueExpr = get_json_object($"after", "$.v").cast("double"))
      .filter($"grp" === "C")
      .agg(sum($"dn"), sum($"dv")).collect()(0)
    assert(deltas == Row(0L, java.math.BigDecimal.valueOf(0).setScale(4)))
  }

  // ---- temporal alignment of two histories ---------------------------------

  private def histOf(rows: Seq[(String, Long, String, Double)], valName: String) = {
    val df = rows.toDF("op", "lsn", "key", valName)
    ScdHistory.batch(df, Seq("key"), Seq("lsn"))
      .select($"key", struct($"lsn").as("valid_from"), $"valid_to", col(valName))
  }

  test("alignHistories tiles interval intersections; open/closed ends; no cross-key rows") {
    // A: k1 has v=1 on [1,5), v=2 on [5,∞); k2 deleted at 4 → [2,4) only
    val ha = histOf(Seq(
      ("insert", 1L, "k1", 1.0), ("update", 5L, "k1", 2.0),
      ("insert", 2L, "k2", 9.0), ("delete", 4L, "k2", 0.0),
      ("insert", 1L, "k3", 7.0)), "a")
    // B: k1 has w=10 on [3,8), w=20 on [8,∞); k2 w=30 on [1,∞); k4 unmatched
    val hb = histOf(Seq(
      ("insert", 3L, "k1", 10.0), ("update", 8L, "k1", 20.0),
      ("insert", 1L, "k2", 30.0), ("insert", 9L, "k4", 40.0)), "b")
    val got = ScdHistory.alignHistories(ha, hb, Seq("key"))
      .select($"key", $"valid_from.lsn", $"valid_to.lsn", $"a", $"b")
      .as[(String, Long, Option[Long], Double, Double)].collect().toSet
    assert(got == Set(
      ("k1", 3L, Some(5L), 1.0, 10.0),   // [1,5)∩[3,8)
      ("k1", 5L, Some(8L), 2.0, 10.0),   // [5,∞)∩[3,8)
      ("k1", 8L, None, 2.0, 20.0),       // [5,∞)∩[8,∞) — both open ⇒ open
      ("k2", 2L, Some(4L), 9.0, 30.0)))  // delete closed A's side at 4
    // k3 (no B history) and k4 (no A history) produce nothing — inner join
  }

  test("alignHistories rejects colliding payload column names") {
    val h = histOf(Seq(("insert", 1L, "k1", 1.0)), "a")
    intercept[IllegalArgumentException] {
      ScdHistory.alignHistories(h, h, Seq("key"))
    }
  }

  test("alignHistories ≡ straight-line per-key interval intersection on random histories") {
    val rnd = new scala.util.Random(11)
    val ops = Array("insert", "update", "delete")
    for (_ <- 1 to 20) {
      val n = 1 + rnd.nextInt(20)
      val ar = (1 to n).map(i =>
        (ops(rnd.nextInt(3)), i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(50).toDouble))
      val br = (1 to n).map(i =>
        (ops(rnd.nextInt(3)), i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(50).toDouble))
      val got = ScdHistory.alignHistories(histOf(ar, "a"), histOf(br, "b"), Seq("key"))
        .select($"key", $"valid_from.lsn", $"valid_to.lsn", $"a", $"b")
        .as[(String, Long, Option[Long], Double, Double)].collect().toSet
      // straight-line truth: enumerate versions per key, intersect all pairs
      def versions(rows: Seq[(String, Long, String, Double)]) =
        rows.groupBy(_._3).flatMap { case (k, evs) =>
          val srt = evs.sortBy(_._2)
          srt.zipWithIndex.collect { case ((op, lsn, _, v), i) if op != "delete" =>
            val to = if (i + 1 < srt.size) Some(srt(i + 1)._2) else None
            (k, lsn, to, v)
          }
        }.toSeq
      val expect = (for {
        (k, af, at, av) <- versions(ar)
        (k2, bf, bt, bv) <- versions(br) if k2 == k
        if bt.forall(af < _) && at.forall(bf < _)
      } yield (k, math.max(af, bf),
        (at, bt) match {
          case (Some(x), Some(y)) => Some(math.min(x, y))
          case (x, y) => x.orElse(y)
        }, av, bv)).toSet
      assert(got == expect, s"a=$ar b=$br")
    }
  }
}
