package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoinRewrite must be invisible in results and decisive in plans:
  * identical rows with the rule on or off, nested-loop join gone when on.
  */
class RangeJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withRule[A](binWidth: Double)(body: => A): A = {
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
    spark.conf.set("spark.graft.rangeJoin.enabled", "true")
    spark.conf.set("spark.graft.rangeJoin.binWidth", binWidth.toString)
    try body
    finally spark.conf.set("spark.graft.rangeJoin.enabled", "false")
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def optimizedStr(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def executedStr(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val points = Seq(1.0, 5.0, 10.0, 17.5, 42.0, 99.0, 100.0, -3.0)
    .zipWithIndex.map { case (p, i) => (i.toLong, p) }
  private val intervals = Seq(
    (100L, 0.0, 10.0), (101L, 10.0, 20.0), (102L, 40.0, 50.0),
    (103L, 90.0, 100.0), (104L, -5.0, -1.0), (105L, 17.5, 17.5))

  private def pointsDf = points.toDF("pid", "p")
  private def intervalsDf = intervals.toDF("iid", "lo", "hi")

  test("BETWEEN theta join: same rows as rule-off, nested loop eliminated") {
    pointsDf.createOrReplaceTempView("rjr_points")
    intervalsDf.createOrReplaceTempView("rjr_intervals")
    val sql = """SELECT pid, iid FROM rjr_points JOIN rjr_intervals
                |ON p BETWEEN lo AND hi""".stripMargin
    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    val off = spark.sql(sql)
    assert(executedStr(off).contains("NestedLoop"),
      "control: Spark should nested-loop a pure BETWEEN join")
    val expected = rows(off)
    withRule(8.0) {
      val on = spark.sql(sql)
      assert(optimizedStr(on).contains("_graft_bin"))
      assert(!executedStr(on).contains("NestedLoop"))
      assert(rows(on) == expected)
      assert(expected.nonEmpty)
    }
  }

  test("orientation: intervals on the left, strict bounds, theta spelled out") {
    val naive = intervalsDf.join(pointsDf, $"p" > $"lo" && $"p" < $"hi")
    val expected = rows(naive)
    withRule(8.0) {
      val on = intervalsDf.join(pointsDf, $"p" > $"lo" && $"p" < $"hi")
      assert(optimizedStr(on).contains("_graft_bin"))
      assert(!executedStr(on).contains("NestedLoop"))
      assert(rows(on) == expected)
      // strict bounds: the zero-width interval (17.5, 17.5) must NOT match
      assert(!expected.exists(_.contains("105")))
    }
  }

  test("equi-key present: rule stands down (hash join already possible)") {
    withRule(8.0) {
      val l = points.map { case (id, p) => (id, p, id % 2) }.toDF("pid", "p", "k")
      val r = intervals.map { case (id, lo, hi) => (id, lo, hi, id % 2) }
        .toDF("iid", "lo", "hi", "k")
      val joined = l.join(r, l("k") === r("k") && $"p".between($"lo", $"hi"))
      assert(!optimizedStr(joined).contains("_graft_bin"))
      assert(!executedStr(joined).contains("NestedLoop"))
    }
  }

  test("inverted and null intervals are dropped before they can explode") {
    // lo=1e9 > hi=0: naively explodes a descending 1e9/w-bin sequence;
    // the sanity filter must make this both correct AND fast
    val bad: Seq[(Long, Option[Double], Option[Double])] = Seq(
      (200L, Some(1.0e9), Some(0.0)), (201L, None, Some(5.0)),
      (202L, Some(3.0), None))
    val r = (intervals.map { case (a, b, c) => (a, Option(b), Option(c)) } ++ bad)
      .toDF("iid", "lo", "hi")
    val expected = rows(
      pointsDf.join(r, $"p" >= $"lo" && $"p" <= $"hi"))
    withRule(8.0) {
      val on = pointsDf.join(r, $"p" >= $"lo" && $"p" <= $"hi")
      assert(optimizedStr(on).contains("_graft_bin"))
      assert(rows(on) == expected)
      assert(!expected.exists(s => s.contains("200") || s.contains("201") ||
        s.contains("202")))
    }
  }

  test("randomized equivalence across bin widths (incl. exact boundaries)") {
    val rnd = new scala.util.Random(20260812)
    val ps = (0 until 300).map(i =>
      (i.toLong, math.floor(rnd.nextDouble() * 200 - 100))) // integral: forces ties
    val ivs = (0 until 120).map { i =>
      val lo = math.floor(rnd.nextDouble() * 200 - 100)
      (1000L + i, lo, lo + math.floor(rnd.nextDouble() * 30))
    }
    val pdf = ps.toDF("pid", "p")
    val idf = ivs.toDF("iid", "lo", "hi")
    val expected = rows(pdf.join(idf, $"p" >= $"lo" && $"p" <= $"hi"))
    for (w <- Seq(1.0, 7.0, 64.0, 1000.0)) withRule(w) {
      val on = pdf.join(idf, $"p" >= $"lo" && $"p" <= $"hi")
      assert(optimizedStr(on).contains("_graft_bin"), s"w=$w")
      assert(rows(on) == expected, s"w=$w")
    }
  }

  test("extension-built session rewrites pure SQL without any API call") {
    val old = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-rjr-ext")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.rangeJoin.binWidth", "8")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    try {
      import s.implicits._
      points.toDF("pid", "p").createOrReplaceTempView("rjr_p2")
      intervals.toDF("iid", "lo", "hi").createOrReplaceTempView("rjr_i2")
      val q = s.sql(
        "SELECT pid, iid FROM rjr_p2 JOIN rjr_i2 ON p >= lo AND p <= hi")
      assert(q.queryExecution.optimizedPlan.toString.contains("_graft_bin"))
      assert(!q.queryExecution.executedPlan.toString.contains("NestedLoop"))
      assert(q.count() > 0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      old.foreach(SparkSession.setDefaultSession)
    }
  }
}
