package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionHeavySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --------------------------------------------------------------- Sessionize

  private val clicks = Seq(
    // user A: three events 10 apart (one session), then a 100 gap, then two more
    ("a", 0L, 1L), ("a", 10L, 2L), ("a", 20L, 3L), ("a", 120L, 4L), ("a", 130L, 5L),
    // user B: single event
    ("b", 50L, 6L),
    // user C: every gap exactly AT the threshold (30) — all one session
    ("c", 0L, 7L), ("c", 30L, 8L), ("c", 60L, 9L)
  ).toDF("user", "t", "id")

  test("sessionize splits on gap > threshold, not >=, and numbers per entity") {
    val got = Sessionize.assign(clicks, Seq("user"), col("t"), Seq(col("id")), gap = 30L)
      .select($"user", $"id", $"session_no").as[(String, Long, Long)]
      .collect().toSet
    assert(got == Set(
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L), ("a", 4L, 2L), ("a", 5L, 2L),
      ("b", 6L, 1L),
      ("c", 7L, 1L), ("c", 8L, 1L), ("c", 9L, 1L)))
  }

  test("sessionize ties on time break deterministically by the tie-break column") {
    val tied = Seq(("u", 100L, 2L), ("u", 100L, 1L), ("u", 500L, 3L))
      .toDF("user", "t", "id")
    val got = Sessionize.assign(tied, Seq("user"), col("t"), Seq(col("id")), gap = 50L)
      .select($"id", $"session_no").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 2L)))
  }

  test("sessionize-then-aggregate plans exactly one exchange") {
    val agg = Sessionize.assign(clicks, Seq("user"), col("t"), Seq(col("id")), gap = 30L)
      .groupBy($"user", $"session_no").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  // ------------------------------------------------------------- HeavyHitters

  /** Oracle: the naive full group-by formulation. */
  private def naive(items: org.apache.spark.sql.DataFrame, c: String, k: Int) = {
    val f = items.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
    val total = items.count()
    f.filter(col("cnt") * k > lit(total))
      .as[(String, Long)].collect().toSet
  }

  test("heavy hitters match the exact group-by on a skewed stream") {
    // 400 of x, 250 of y, 100 of z, 250 singletons — k=4 ⇒ threshold 250
    val data = (Seq.fill(400)("x") ++ Seq.fill(250)("y") ++ Seq.fill(100)("z") ++
      (1 to 250).map(i => s"rare$i"))
    val df = data.toDF("item").repartition(8)
    val got = HeavyHitters.heavyHitters(df, "item", k = 4)
      .as[(String, Long)].collect().toSet
    assert(got == naive(df, "item", 4))
    assert(got == Set(("x", 400L))) // y at exactly N/k=250 is excluded (strict >)
  }

  test("heavy hitters are invariant to partitioning") {
    val data = (Seq.fill(600)("hot") ++ (1 to 900).map(i => s"cold${i % 300}"))
    for (p <- Seq(1, 3, 16)) {
      val df = data.toDF("item").repartition(p)
      val got = HeavyHitters.heavyHitters(df, "item", k = 3)
        .as[(String, Long)].collect().toSet
      assert(got == Set(("hot", 600L)), s"failed at $p partitions")
    }
  }

  // ------------------------------------------------------------------- TopK

  test("topKPerGroup equals the window row_number formulation on skewed groups") {
    import org.apache.spark.sql.expressions.Window
    // group a: 1000 rows (skew), b: 7, c: 3 (< k), d: 1; duplicate values
    // exercise the id tie-break
    val rows = (1 to 1000).map(i => ("a", (i % 97).toDouble, i.toLong)) ++
      (1 to 7).map(i => ("b", 5.0, 1000L + i)) ++
      (1 to 3).map(i => ("c", i.toDouble, 2000L + i)) ++
      Seq(("d", 9.9, 3000L))
    val df = rows.toDF("g", "v", "id").repartition(8)
    val got = TopK.topKPerGroup(df, "g", "v", "id", k = 5)
      .as[(String, Long, Long, Double)].collect().toSet
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val want = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"g", $"rank".cast("long"), $"id", $"v")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == want)
    assert(got.count(_._1 == "c") == 3 && got.count(_._1 == "d") == 1,
      "groups smaller than k return all their rows")
  }

  test("topKPerGroup: null rows are excluded, NaN ranks largest deterministically") {
    val df = Seq[(String, java.lang.Double, java.lang.Long)](
      ("g", 5.0, 1L), ("g", null, 2L), ("g", Double.NaN, 3L),
      ("g", Double.NaN, 4L), ("g", 7.0, 5L), ("g", 6.0, null))
      .toDF("g", "v", "id")
    val got = TopK.topKPerGroup(df, "g", "v", "id", k = 3)
      .select($"rank", $"id").as[(Long, Long)].collect().toSet
    // NaN > 7.0 > 5.0 (Spark sort order); NaN tie breaks by id; null rows out
    assert(got == Set((1L, 3L), (2L, 4L), (3L, 5L)))
  }

  test("topKPerGroup plans partial aggregation, not a window sort") {
    val df = (1 to 100).map(i => ("g" + i % 3, i.toDouble, i.toLong)).toDF("g", "v", "id")
    val plan = TopK.topKPerGroup(df, "g", "v", "id", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"must not plan a window:\n$plan")
    assert("partial_topkagg|ObjectHashAggregate|SortAggregate".r
      .findFirstIn(plan).isDefined, s"expected an aggregate-based plan:\n$plan")
  }

  test("heavy hitters on adversarial all-distinct input is empty, empty input is empty") {
    val distinct = (1 to 500).map(_.toString).toDF("item").repartition(4)
    assert(HeavyHitters.heavyHitters(distinct, "item", k = 10).count() == 0)
    val empty = Seq.empty[String].toDF("item")
    assert(HeavyHitters.heavyHitters(empty, "item", k = 10).count() == 0)
  }

  test("heavy hitters exclude nulls from candidates AND from the threshold total") {
    // 40 nulls + 30 "a" + 30 singletons; over NON-NULL occurrences (60),
    // "a" clears N/k = 20 with k=3. Nulls must neither appear nor inflate
    // the total (over raw rows 100/3 = 33.3 would wrongly exclude "a")
    val data = (Seq.fill(40)(null: String) ++ Seq.fill(30)("a") ++
      (1 to 30).map(i => s"s$i")).toDF("item").repartition(5)
    val got = HeavyHitters.heavyHitters(data, "item", k = 3)
      .as[(String, Long)].collect().toSet
    assert(got == Set(("a", 30L)))
  }

  test("funnel: order matters, strict ties, per-stage levels, absent step = 0") {
    import spark.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2: purchase BEFORE click — only view+click count
      (2L, "view", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(5)),
      // user 3: click at the SAME ts as view — strictness rejects it
      (3L, "view", ts(1)), (3L, "click", ts(1)),
      // user 4: never views; clicks and purchases are unreachable
      (4L, "click", ts(1)), (4L, "purchase", ts(2)),
      // user 5: first-touch semantics — the EARLIEST view anchors, so a
      // click between two views still counts
      (5L, "view", ts(1)), (5L, "click", ts(2)), (5L, "view", ts(3))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.stages(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0, 5L -> 2), s"$got")
  }
}
