package graft.cdc

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental join-view maintenance: the delta-join fold must equal the
  * from-scratch join of the two compacted latest states under every
  * batching, with updates, deletes, regroups (join-attr change) and
  * resurrect transitions on both sides.
  */
class JoinViewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (op, lsn, uid, uval, seg) — users side, joins on seg
  private val aRows = Seq(
    ("insert", 1L, 1L, 10.0, 100L),
    ("update", 4L, 1L, 11.0, 100L),  // value update
    ("update", 9L, 1L, 11.0, 200L),  // JOIN-ATTR change: moves u1 100→200
    ("insert", 2L, 2L, 20.0, 100L),
    ("delete", 7L, 2L, 0.0, 0L),     // delete retracts u2's pairs
    ("insert", 3L, 3L, 30.0, 300L),  // joins nothing until s300 appears
    ("insert", 5L, 4L, 40.0, 100L),
    ("delete", 6L, 4L, 0.0, 0L),
    ("insert", 8L, 4L, 41.0, 100L)   // post-delete resurrect
  )
  // (op, lsn, seg, sval) — segments side
  private val bRows = Seq(
    ("insert", 1L, 100L, 1.0),
    ("update", 5L, 100L, 1.5),       // update fans to every u in seg 100
    ("insert", 2L, 200L, 2.0),
    ("insert", 4L, 300L, 3.0),
    ("delete", 6L, 300L, 0.0),       // tombstone retracts u3's pair
    ("insert", 3L, 400L, 4.0)        // joins no user
  )

  private def aDf(rows: Seq[(String, Long, Long, Double, Long)]): DataFrame =
    rows.toDF("op", "lsn", "user_id", "user_value", "seg")
  private def bDf(rows: Seq[(String, Long, Long, Double)]): DataFrame =
    rows.toDF("op", "lsn", "segment_id", "segment_value")

  private val aSide = JoinView.Side(Seq("user_id"), Seq("lsn"),
    Seq("user_id", "user_value", "seg"), joinCol = "seg")
  private val bSide = JoinView.Side(Seq("segment_id"), Seq("lsn"),
    Seq("segment_id", "segment_value"), joinCol = "segment_id")

  /** From-scratch truth: compact each side, join. */
  private def direct(a: DataFrame, b: DataFrame): Set[(Long, Double, Long, Double)] = {
    val la = LatestState.batch(
      a.withColumn("table", lit("a")), Seq("table", "user_id"), Seq("lsn"))
    val lb = LatestState.batch(
      b.withColumn("table", lit("b")), Seq("table", "segment_id"), Seq("lsn"))
    la.join(lb, la("seg") === lb("segment_id"))
      .select($"user_id", $"user_value", $"segment_id", $"segment_value")
      .as[(Long, Double, Long, Double)].collect().toSet
  }

  private def folded(a: DataFrame, b: DataFrame, cuts: Seq[Long]): DataFrame = {
    val bounds = (Seq(Long.MinValue) ++ cuts ++ Seq(Long.MaxValue)).sliding(2).toSeq
    val batches = bounds.map { case Seq(lo, hi) =>
      (a.filter($"lsn" > lo && $"lsn" <= hi), b.filter($"lsn" > lo && $"lsn" <= hi))
    }
    JoinView.foldAll(batches, aSide, bSide).view
  }

  test("single-batch fold ≡ from-scratch join (all transition kinds)") {
    val v = folded(aDf(aRows), bDf(bRows), Nil)
    assert(v.agg(max($"n")).head().getLong(0) == 1L) // keyed sides ⇒ set view
    assert(v.select($"user_id", $"user_value", $"segment_id", $"segment_value")
      .as[(Long, Double, Long, Double)].collect().toSet ==
      direct(aDf(aRows), bDf(bRows)))
  }

  test("every batching folds to the same view") {
    val expect = direct(aDf(aRows), bDf(bRows))
    for (cuts <- Seq(Seq(4L), Seq(2L, 6L), Seq(1L, 3L, 5L, 7L))) {
      val got = folded(aDf(aRows), bDf(bRows), cuts)
        .select($"user_id", $"user_value", $"segment_id", $"segment_value")
        .as[(Long, Double, Long, Double)].collect().toSet
      assert(got == expect, s"cuts=$cuts")
    }
  }

  test("intermediate states are exact too: fold prefix ≡ direct join of prefix") {
    val upTo = 5L
    val st = folded(aDf(aRows), bDf(bRows), Seq(2L, upTo)) // 3 batches
    // refold just the first two batches
    val pa = aDf(aRows).filter($"lsn" <= upTo)
    val pb = bDf(bRows).filter($"lsn" <= upTo)
    val prefix = folded(pa, pb, Seq(2L))
      .select($"user_id", $"user_value", $"segment_id", $"segment_value")
      .as[(Long, Double, Long, Double)].collect().toSet
    assert(prefix == direct(pa, pb))
    st.collect() // final state still materializes fine after the prefix read
  }

  test("replayed micro-batch is a no-op; stale events cannot regress the view") {
    val a = aDf(aRows); val b = bDf(bRows)
    val cut = 5L
    val (a1, a2) = (a.filter($"lsn" <= cut), a.filter($"lsn" > cut))
    val (b1, b2) = (b.filter($"lsn" <= cut), b.filter($"lsn" > cut))
    val st = JoinView.foldAll(Seq((a1, b1), (a2, b2)), aSide, bSide)
    def viewSet(s: JoinView.State) =
      s.view.select($"user_id", $"user_value", $"segment_id", $"segment_value")
        .as[(Long, Double, Long, Double)].collect().toSet
    val expect = viewSet(st)
    assert(expect == direct(a, b))
    // full redelivery of batch 1 (source replay / foreachBatch retry):
    // every event is stale now — strict no-op
    val replayed = JoinView.fold(st, a1, b1, aSide, bSide)
    assert(viewSet(replayed) == expect)
    assert(replayed.latestA.count() == st.latestA.count())
    // a single stale event older than the standing version for its key
    // must not regress (u1 is at lsn 9; this update is lsn 2)
    val stale = aDf(Seq(("update", 2L, 1L, 99.0, 100L)))
    val after = JoinView.fold(replayed, stale, b1.limit(0), aSide, bSide)
    assert(viewSet(after) == expect)
  }

  test("persisted fold: bucketed tables reconstruct the direct join; retries and redeliveries stable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jv").toString
    val a = aDf(aRows); val b = bDf(bRows)
    val (a1, a2) = (a.filter($"lsn" <= 5), a.filter($"lsn" > 5))
    val (b1, b2) = (b.filter($"lsn" <= 5), b.filter($"lsn" > 5))
    JoinView.foldPersisted(spark, dir, a1, b1, aSide, bSide, batchId = 0, numBuckets = 8)
    JoinView.foldPersisted(spark, dir, a2, b2, aSide, bSide, batchId = 1, numBuckets = 8)
    def viewSet() = JoinView.readPersistedView(spark, dir)
      .select($"user_id", $"user_value", $"segment_id", $"segment_value")
      .as[(Long, Double, Long, Double)].collect().toSet
    val expect = direct(a, b)
    assert(viewSet() == expect)
    // same-id retry: marker-guarded no-op
    assert(JoinView.foldPersisted(spark, dir, a1, b1, aSide, bSide,
      batchId = 1, numBuckets = 8) == 0)
    // redelivery under a NEW id: advance guard folds empty deltas
    JoinView.foldPersisted(spark, dir, a1, b1, aSide, bSide,
      batchId = 99, numBuckets = 8)
    assert(viewSet() == expect)
    // multiplicities are a set (keyed sides)
    assert(JoinView.readPersistedView(spark, dir)
      .agg(max($"n")).head().getLong(0) == 1L)
  }

  test("persisted fold crash recovery: retry after ANY crash point converges, never double-counts") {
    val a = aDf(aRows); val b = bDf(bRows)
    val (a1, a2) = (a.filter($"lsn" <= 5), a.filter($"lsn" > 5))
    val (b1, b2) = (b.filter($"lsn" <= 5), b.filter($"lsn" > 5))
    val expect = direct(a, b)
    for (crashAt <- Seq("after_stage", "after_latest_merge", "after_view_merge")) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_jvc").toString
      JoinView.foldPersisted(spark, dir, a1, b1, aSide, bSide, batchId = 0,
        numBuckets = 8)
      // process dies mid-fold of batch 1...
      intercept[JoinView.InjectedCrash] {
        JoinView.foldPersistedInjected(spark, dir, a2, b2, aSide, bSide,
          batchId = 1, numBuckets = 8, crashAt)
      }
      // ...and the retry of the SAME batch id must land the batch exactly
      // once. The dangerous case is after_latest_merge: the latest tables
      // have advanced, so a naive retry would compute empty deltas and
      // silently drop batch 1's view contribution; the staged deltas replay
      // it. after_view_merge tests the opposite hazard (double-fold),
      // caught by the view manifest's batch-id watermark.
      JoinView.foldPersisted(spark, dir, a2, b2, aSide, bSide, batchId = 1,
        numBuckets = 8)
      val got = JoinView.readPersistedView(spark, dir)
        .select($"user_id", $"user_value", $"segment_id", $"segment_value")
        .as[(Long, Double, Long, Double)].collect().toSet
      assert(got == expect, s"crashAt=$crashAt")
      assert(JoinView.readPersistedView(spark, dir)
        .agg(max($"n")).head().getLong(0) == 1L,
        s"multiplicity corruption after crashAt=$crashAt")
      // staged files are cleaned up once the batch commits
      assert(!new java.io.File(s"$dir/_staged/1").exists(),
        s"stage not cleaned after crashAt=$crashAt")
    }
  }

  test("vacuum after crash+retry removes only unreferenced files; stages prune safely") {
    val a = aDf(aRows); val b = bDf(bRows)
    val (a1, a2) = (a.filter($"lsn" <= 5), a.filter($"lsn" > 5))
    val (b1, b2) = (b.filter($"lsn" <= 5), b.filter($"lsn" > 5))
    val expect = direct(a, b)
    def plantStage(dir: String, id: Long): java.io.File = {
      val st = new java.io.File(s"$dir/_staged/$id")
      st.mkdirs()
      java.nio.file.Files.write(st.toPath.resolve("junk.parquet"),
        "LEAKED STAGE".getBytes("UTF-8"))
      st
    }
    for (crashAt <- Seq("after_stage", "after_latest_merge", "after_view_merge")) {
      val dir = java.nio.file.Files.createTempDirectory("graft_jvv").toString
      JoinView.foldPersisted(spark, dir, a1, b1, aSide, bSide, batchId = 0,
        numBuckets = 8)
      intercept[JoinView.InjectedCrash] {
        JoinView.foldPersistedInjected(spark, dir, a2, b2, aSide, bSide,
          batchId = 1, numBuckets = 8, crashAt)
      }
      JoinView.foldPersisted(spark, dir, a2, b2, aSide, bSide, batchId = 1,
        numBuckets = 8)
      // the MARK+CLEAN window leak: marker exists, staged dir left behind —
      // vacuum must prune it (it is provably applied)
      val leaked = plantStage(dir, 1)
      // an UN-marked stage is an in-flight attempt: vacuum must leave it
      val inflight = plantStage(dir, 99)
      val removed = JoinView.vacuum(spark, dir)
      assert(removed >= 1, s"crashAt=$crashAt removed=$removed")
      assert(!leaked.exists(), s"marked stage must be pruned (crashAt=$crashAt)")
      assert(inflight.exists(), s"marker-less stage must survive (crashAt=$crashAt)")
      // vacuum can never change the view
      val got = JoinView.readPersistedView(spark, dir)
        .select($"user_id", $"user_value", $"segment_id", $"segment_value")
        .as[(Long, Double, Long, Double)].collect().toSet
      assert(got == expect, s"state changed by vacuum (crashAt=$crashAt)")
      // the marker fast-path finishes MARK+CLEAN on its own too
      plantStage(dir, 1)
      assert(JoinView.foldPersisted(spark, dir, a2, b2, aSide, bSide,
        batchId = 1, numBuckets = 8) == 0)
      assert(!leaked.exists(),
        s"fast-path retry must delete the leaked stage (crashAt=$crashAt)")
    }
  }

  test("streaming maintain: tagged union stream folds per trigger; redelivery silent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // unified row: (_side, op, lsn, user_id, user_value, seg, segment_id, segment_value)
    type Tagged = (String, String, Long, Long, Double, Long, Long, Double)
    def tagA(r: (String, Long, Long, Double, Long)): Tagged =
      ("a", r._1, r._2, r._3, r._4, r._5, 0L, 0.0)
    def tagB(r: (String, Long, Long, Double)): Tagged =
      ("b", r._1, r._2, 0L, 0.0, 0L, r._3, r._4)
    val input =
      MemoryStream[(String, String, Long, Long, Double, Long, Long, Double)]
    val tagged = input.toDF().toDF("_side", "op", "lsn",
      "user_id", "user_value", "seg", "segment_id", "segment_value")
    @volatile var current: JoinView.State = null
    val q = JoinView.maintain(tagged, "_side", "a", aSide, bSide) { st =>
      current = st
    }
    try {
      val (a1, a2) = aRows.partition(_._2 <= 4)
      val (b1, b2) = bRows.partition(_._2 <= 4)
      input.addData(a1.map(tagA) ++ b1.map(tagB))
      q.processAllAvailable()
      val mid = current.view.count()
      assert(mid > 0)
      input.addData(a2.map(tagA) ++ b2.map(tagB) ++ a1.map(tagA)) // replay a1
      q.processAllAvailable()
      val got = current.view
        .select($"user_id", $"user_value", $"segment_id", $"segment_value")
        .as[(Long, Double, Long, Double)].collect().toSet
      assert(got == direct(aDf(aRows), bDf(bRows)))
    } finally q.stop()
  }

  test("randomized: 30 seeded corpora × arbitrary cut points ≡ direct join") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 30) {
      val n = 1 + rnd.nextInt(25)
      val ops = Array("insert", "update", "delete")
      val ar = (1 to n).map { i =>
        (ops(rnd.nextInt(3)), i.toLong, (1 + rnd.nextInt(4)).toLong,
          rnd.nextInt(100).toDouble, (1 + rnd.nextInt(3)).toLong * 100) }
      val br = (1 to n).map { i =>
        (ops(rnd.nextInt(3)), i.toLong, (1 + rnd.nextInt(3)).toLong * 100,
          rnd.nextInt(100).toDouble) }
      val cuts = (1 to rnd.nextInt(3)).map(_ => 1L + rnd.nextInt(n)).distinct.sorted
      val got = folded(aDf(ar), bDf(br), cuts)
        .select($"user_id", $"user_value", $"segment_id", $"segment_value")
        .as[(Long, Double, Long, Double)].collect().toSet
      assert(got == direct(aDf(ar), bDf(br)), s"n=$n cuts=$cuts a=$ar b=$br")
    }
  }
}
