package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleJoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("bucketed join plans with zero shuffle exchanges") {
    // clean both catalog entries and leftover warehouse dirs (the in-memory
    // catalog forgets tables between JVMs; the directories persist)
    // the warehouse location comes from the session conf — cleaning a
    // hard-coded "spark-warehouse/" missed the real dir and a table
    // directory surviving from a previous JVM (whose in-memory catalog died
    // with it) failed the CREATE with LOCATION_ALREADY_EXISTS
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("b_lineitem", "b_orders")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val li = graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val o = graft.Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val (bl, bo) = ScaleJoins.bucketedTables(spark, li, o, "l_orderkey", 8,
      "b_lineitem", "b_orders")
    val joined = bl.join(bo, "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // and it is still correct
    val expected = li.join(o, "l_orderkey").count()
    assert(joined.count() == expected)
  }

  test("as-of join: tie visibility, gaps, and no-prior-match nulls") {
    import spark.implicits._
    val left = Seq((7L, 10L, "p1"), (7L, 20L, "p2"), (7L, 5L, "p0"),
      (8L, 15L, "q1")).toDF("k", "ts", "tag")
    val right = Seq((7L, 10L, 1.0), (7L, 12L, 2.0), (7L, 3L, 0.5),
      (9L, 1L, 9.9)).toDF("k", "rts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts",
        Map("rts" -> "asof_ts", "v" -> "asof_v"))
      .select("k", "ts", "asof_ts", "asof_v")
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    assert(out == Set(
      (7L, 5L, Some(3L), Some(0.5)),    // latest ≤ 5 is 3
      (7L, 10L, Some(10L), Some(1.0)),  // tie: same-ts right IS visible (≤)
      (7L, 20L, Some(12L), Some(2.0)),
      (8L, 15L, None, None)))           // key with no right rows at all

    val strict = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts",
        Map("rts" -> "asof_ts"), strict = true)
      .filter(col("ts") === 10).select("asof_ts").as[Option[Long]].collect()
    assert(strict.toSeq == Seq(Some(3L)))  // strict <: same-ts right hidden

    // fractional time axes keep sub-unit precision (no integral truncation):
    // a right row at 10.9 must NOT match a left row at 10.2
    val fracOut = AsOfJoin.asOf(
        Seq((1L, 10.2)).toDF("k", "ts"),
        Seq((1L, 10.9, "future"), (1L, 9.5, "past")).toDF("k", "rts", "v"),
        Seq("k"), "ts", "rts", Map("v" -> "asof_v"))
      .select("asof_v").as[String].collect()
    assert(fracOut.toSeq == Seq("past"))

    // mismatched time types fail loudly instead of silently coercing
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(Seq((1L, 10.2)).toDF("k", "ts"),
        Seq((1L, 9L, 1.0)).toDF("k", "rts", "v"),
        Seq("k"), "ts", "rts", Map("v" -> "asof_v"))
    }
  }

  test("as-of join: forward direction and staleness tolerance") {
    import spark.implicits._
    val left = Seq((7L, 10L, "p1"), (7L, 20L, "p2"), (8L, 15L, "q1"))
      .toDF("k", "ts", "tag")
    val right = Seq((7L, 10L, 1.0), (7L, 12L, 2.0), (7L, 3L, 0.5),
      (7L, 100L, 9.0)).toDF("k", "rts", "v")
    // forward: EARLIEST right ≥ left; same-ts tie visible (non-strict)
    val fwd = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts",
        Map("rts" -> "nxt_ts", "v" -> "nxt_v"), forward = true)
      .select("k", "ts", "nxt_ts", "nxt_v")
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    assert(fwd == Set(
      (7L, 10L, Some(10L), Some(1.0)),   // tie visible
      (7L, 20L, Some(100L), Some(9.0)),  // next at-or-after 20 is 100
      (8L, 15L, None, None)))            // key with no right rows
    // forward + strict: the same-ts right row is hidden
    val fwdStrict = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts",
        Map("rts" -> "nxt_ts"), strict = true, forward = true)
      .filter(col("ts") === 10).select("nxt_ts").as[Option[Long]].collect()
    assert(fwdStrict.toSeq == Seq(Some(12L)))
    // staleness tolerance: the carried match is nulled when too old — the
    // LEFT ROW is kept (enrichment never drops facts)
    val tol = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts",
        Map("rts" -> "asof_ts", "v" -> "asof_v"),
        fresh = Some((l, r) => l - r <= lit(5L)))
      .select("k", "ts", "asof_ts", "asof_v")
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    assert(tol == Set(
      (7L, 10L, Some(10L), Some(1.0)),   // staleness 0 ≤ 5
      (7L, 20L, None, None),             // nearest (12) is 8 stale → nulled
      (8L, 15L, None, None)))
    // forward + tolerance compose (bound on how far AHEAD the match may be)
    val fwdTol = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts",
        Map("rts" -> "nxt_ts"), forward = true,
        fresh = Some((l, r) => r - l <= lit(5L)))
      .select("k", "ts", "nxt_ts").as[(Long, Long, Option[Long])].collect().toSet
    assert(fwdTol == Set((7L, 10L, Some(10L)), (7L, 20L, None), (8L, 15L, None)))
  }

  test("as-of join agrees with the naive theta-join + argmax formulation") {
    val ev = graft.Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"))
    val updates = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("value"))
    val fast = AsOfJoin.asOf(purchases, updates, Seq("user_id"), "event_id", "event_id",
        Map("event_id" -> "state_lsn", "value" -> "state_value"))
      .select("user_id", "event_id", "state_lsn", "state_value")
    // naive: every (purchase, earlier-update) pair, argmax per purchase
    val updatesR = updates.select(col("user_id").as("u_uid"),
      col("event_id").as("u_eid"), col("value"))
    val naive = purchases.join(updatesR,
        col("user_id") === col("u_uid") && col("u_eid") <= col("event_id"), "left")
      .groupBy(col("user_id"), col("event_id"))
      .agg(max_by(struct(col("u_eid").as("state_lsn"), col("value").as("state_value")),
        col("u_eid")).as("s"))
      .select(col("user_id"), col("event_id"), col("s.state_lsn"), col("s.state_value"))
    assert(fast.count() == purchases.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("binned range join == naive theta join (overlaps, boundaries, negatives)") {
    import spark.implicits._
    val points = ((-20 to 40).map(_.toDouble) ++ Seq(0.0, 9.999, 10.0, 10.001))
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "x")
    val intervals = Seq((1L, -15.0, -5.0), (2L, -6.0, 12.0), (3L, 10.0, 10.0),
      (4L, 9.0, 39.0), (5L, 35.0, 200.0), (6L, -100.0, 100.0))
      .toDF("iid", "lo", "hi")
    val expected = RangeJoin.naive(points, "x", intervals, "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(0.5, 3.0, 10.0, 1000.0)) {
      val got = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(got.toSet == expected, s"mismatch at binWidth=$w")
    }
  }

  test("interval overlap join == naive theta join, exactly once, across bin widths") {
    import spark.implicits._
    // touching ends, containment, identical spans, negatives, a zero-length
    // interval, and a disjoint pair — with and without an equi-key
    val a = Seq((1L, "x", -10.0, 0.0), (2L, "x", 0.0, 5.0), (3L, "y", 3.0, 3.0),
      (4L, "x", 100.0, 200.0), (5L, "y", -50.0, 50.0)).toDF("aid", "k", "a_lo", "a_hi")
    val b = Seq((10L, "x", 0.0, 2.0), (20L, "x", -30.0, -10.0), (30L, "y", 3.0, 9.0),
      (40L, "x", 150.0, 150.0), (50L, "y", 60.0, 70.0)).toDF("bid", "k", "b_lo", "b_hi")
    for (keys <- Seq(Nil, Seq("k")); w <- Seq(0.7, 5.0, 64.0, 1000.0)) {
      val expected = RangeJoin.naiveOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", keys)
        .select("aid", "bid").as[(Long, Long)].collect().toSet
      val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", w, keys)
        .select("aid", "bid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at w=$w keys=$keys")
      assert(got.toSet == expected, s"mismatch at w=$w keys=$keys")
    }
    // sanity: the keyless expected set includes touching ends (1,10) and (2,10)
    val keyless = RangeJoin.naiveOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi")
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(Set((1L, 10L), (2L, 10L)).subsetOf(keyless))
  }

  test("salted join returns identical results to a plain join") {
    import spark.implicits._
    // skewed left side: key 1 dominates
    val left = (Seq.fill(5000)((1L, "hot")) ++ (2L to 50L).map(k => (k, s"v$k")))
      .toDF("k", "lv")
    val right = (1L to 50L).map(k => (k, k * 10)).toDF("k", "rv")
    val plain = left.join(right, "k").groupBy("k").agg(count(lit(1)).as("n"),
      sum("rv").as("s")).orderBy("k").collect().toSeq
    val salted = ScaleJoins.saltedJoin(left, right, "k", saltFactor = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }
}
