package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** GlobalRank ≡ the single-partition window formulation, for every helper
  * and across bucket counts (1, 3, 8, 64 — including buckets ≫ rows, so
  * empty buckets and one-row buckets are exercised). The equivalence must
  * hold for ANY nBuckets because only order-alignment of the range buckets
  * is assumed; a boundary-placement dependence would show up here first.
  */
class GlobalRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // skewed values with duplicates (ties broken by id), plus a null value
  private def df: DataFrame = {
    val rows = (1L to 97L).map { i =>
      (i, (i * 37 % 11).toDouble, if (i % 13 == 0) null
        else java.math.BigDecimal.valueOf(i * 7 % 29).setScale(2))
    }
    rows.toDF("id", "v", "dec")
  }

  private val buckets = Seq(1, 3, 8, 64)

  test("rowNumber matches row_number() over a total order, any nBuckets") {
    val expect = df.select($"id",
        row_number().over(Window.orderBy($"v".desc, $"id")).cast("long").as("rn"))
      .orderBy($"id").collect().toSeq
    for (b <- buckets) {
      val got = GlobalRank.rowNumber(df, Seq($"v".desc, $"id"), "rn", b)
        .select($"id", $"rn").orderBy($"id").collect().toSeq
      assert(got == expect, s"nBuckets=$b")
    }
  }

  test("rowNumber countCol is the exact row count literal") {
    val out = GlobalRank.rowNumber(df, Seq($"id"), "rn", 8, Some("n"))
    assert(out.select($"n").distinct().as[Long].collect().toSeq == Seq(97L))
  }

  test("cumSum matches SUM OVER ROWS UNBOUNDED PRECEDING — long, double, decimal") {
    val w = Window.orderBy($"v".desc, $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for (b <- buckets) {
      // decimal (with nulls: sum skips them, bases coalesce them to zero)
      val eDec = df.select($"id", sum($"dec").over(w).as("c"))
        .orderBy($"id").collect().toSeq
      val gDec = GlobalRank.cumSum(df, Seq($"v".desc, $"id"), $"dec", "c", b)
        .select($"id", $"c").orderBy($"id").collect().toSeq
      assert(gDec == eDec, s"decimal nBuckets=$b")
      // long
      val eL = df.select($"id", sum($"id").over(w).as("c"))
        .orderBy($"id").collect().toSeq
      val gL = GlobalRank.cumSum(df, Seq($"v".desc, $"id"), $"id", "c", b)
        .select($"id", $"c").orderBy($"id").collect().toSeq
      assert(gL == eL, s"long nBuckets=$b")
    }
  }

  test("cumSum totalCol equals the grand total, type-stable") {
    val out = GlobalRank.cumSum(df, Seq($"id"), $"dec", "c", 8, Some("tot"))
    val direct = df.agg(sum($"dec")).collect()(0).getDecimal(0)
    val tots = out.select($"tot").distinct().collect().map(_.getDecimal(0))
    assert(tots.length == 1 && tots(0).compareTo(direct) == 0)
    assert(out.schema("tot").dataType == out.schema("c").dataType)
  }

  test("cumMax matches MAX OVER — inclusive and exclusive, across types") {
    val ord = Seq($"v".desc, $"id")
    val wIn = Window.orderBy($"v".desc, $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wEx = Window.orderBy($"v".desc, $"id")
      .rowsBetween(Window.unboundedPreceding, -1)
    for (b <- buckets) {
      val eIn = df.select($"id", max($"dec").over(wIn).as("m"))
        .orderBy($"id").collect().toSeq
      val gIn = GlobalRank.cumMax(df, ord, $"dec", "m", b)
        .select($"id", $"m").orderBy($"id").collect().toSeq
      assert(gIn == eIn, s"inclusive nBuckets=$b")
      val eEx = df.select($"id", max($"id").over(wEx).as("m"))
        .orderBy($"id").collect().toSeq
      val gEx = GlobalRank.cumMax(df, ord, $"id", "m", b, exclusive = true)
        .select($"id", $"m").orderBy($"id").collect().toSeq
      assert(gEx == eEx, s"exclusive nBuckets=$b")
    }
  }

  test("lead1 matches lead(col,1) incl. the cross-bucket handoff rows") {
    val sparse = df.filter($"id" % 7 =!= 0).select($"id")
    val expect = sparse
      .select($"id", lead($"id", 1).over(Window.orderBy($"id")).as("nxt"))
      .orderBy($"id").collect().toSeq
    for (b <- buckets) {
      val got = GlobalRank.lead1(sparse, "id", "nxt", b)
        .select($"id", $"nxt").orderBy($"id").collect().toSeq
      assert(got == expect, s"nBuckets=$b")
    }
  }

  test("lag1 matches lag(value,1) incl. the cross-bucket handoff rows") {
    val base = df.select($"id", ($"id" * 3).as("val"))
    val expect = base
      .select($"id", lag($"val", 1).over(Window.orderBy($"id")).as("p"))
      .orderBy($"id").collect().toSeq
    for (b <- buckets) {
      val got = GlobalRank.lag1(base, "id", $"val", "p", b)
        .select($"id", $"p").orderBy($"id").collect().toSeq
      assert(got == expect, s"nBuckets=$b")
    }
  }

  test("rank/denseRank match the window forms under ties (tie runs never span buckets)") {
    // order by v ONLY — heavy ties (11 distinct values over 97 rows), so
    // tie runs and their gaps are the whole test
    for (b <- buckets) {
      val eR = df.select($"id", org.apache.spark.sql.functions.rank()
          .over(Window.orderBy($"v")).cast("long").as("r"))
        .orderBy($"id").collect().toSeq
      val gR = GlobalRank.rank(df, Seq($"v"), "r", b)
        .select($"id", $"r").orderBy($"id").collect().toSeq
      assert(gR == eR, s"rank nBuckets=$b")
      val eD = df.select($"id", dense_rank()
          .over(Window.orderBy($"v".desc)).cast("long").as("d"))
        .orderBy($"id").collect().toSeq
      val gD = GlobalRank.denseRank(df, Seq($"v".desc), "d", b)
        .select($"id", $"d").orderBy($"id").collect().toSeq
      assert(gD == eD, s"denseRank nBuckets=$b")
    }
  }

  test("ntile matches ntile() across tile counts, ties, and non-dividing sizes") {
    for (b <- Seq(1, 8); n <- Seq(1, 2, 3, 7, 10, 97, 150)) {
      val expect = df.select($"id",
          org.apache.spark.sql.functions.ntile(n)
            .over(Window.orderBy($"v".desc, $"id")).cast("long").as("t"))
        .orderBy($"id").collect().toSeq
      val got = GlobalRank.ntile(df, Seq($"v".desc, $"id"), n, "t", b)
        .select($"id", $"t").orderBy($"id").collect().toSeq
      assert(got == expect, s"n=$n nBuckets=$b")
    }
  }

  test("null ORDER values: bucket placement agrees with the window's null ordering") {
    // range partitioning and WindowExec must place nulls identically
    // (both derive SortOrder from the same columns — asc nulls first,
    // desc nulls last); a disagreement would mis-base every bucket
    val rows = (1L to 60L).map(i =>
      (i, if (i % 5 == 0) null else java.lang.Double.valueOf((i * 13 % 7).toDouble)))
    val ndf = rows.toDF("id", "nv")
    for (b <- buckets; desc <- Seq(false, true)) {
      val ord = if (desc) Seq($"nv".desc, $"id") else Seq($"nv", $"id")
      val w = Window.orderBy(ord: _*)
      val expectRn = ndf.select($"id",
          row_number().over(w).cast("long").as("rn"))
        .orderBy($"id").collect().toSeq
      val gotRn = GlobalRank.rowNumber(ndf, ord, "rn", b)
        .select($"id", $"rn").orderBy($"id").collect().toSeq
      assert(gotRn == expectRn, s"rowNumber nulls desc=$desc nBuckets=$b")
      val expectC = ndf.select($"id", sum($"id").over(
          Window.orderBy(ord: _*).rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).as("c"))
        .orderBy($"id").collect().toSeq
      val gotC = GlobalRank.cumSum(ndf, ord, $"id", "c", b)
        .select($"id", $"c").orderBy($"id").collect().toSeq
      assert(gotC == expectC, s"cumSum nulls desc=$desc nBuckets=$b")
      // rank/denseRank: order by nv ALONE so the null group is a real tie
      // run — dense_rank counts it as one distinct key; the per-bucket
      // base must too (countDistinct over a bare column would skip it and
      // every bucket after the null-holding one would rank too low)
      val nvOrd = if (desc) Seq($"nv".desc) else Seq($"nv")
      val expectDr = ndf.select($"id",
          dense_rank().over(Window.orderBy(nvOrd: _*)).cast("long").as("dr"),
          org.apache.spark.sql.functions.rank()
            .over(Window.orderBy(nvOrd: _*)).cast("long").as("rk"))
        .orderBy($"id").collect().toSeq
      val gotDr = GlobalRank.rank(
          GlobalRank.denseRank(ndf, nvOrd, "dr", b), nvOrd, "rk", b)
        .select($"id", $"dr", $"rk").orderBy($"id").collect().toSeq
      assert(gotDr == expectDr, s"rank/denseRank nulls desc=$desc nBuckets=$b")
    }
  }

  test("empty frame: all helpers return empty, no failure") {
    val e = df.filter($"id" < 0)
    assert(GlobalRank.rowNumber(e, Seq($"id"), "rn").count() == 0)
    assert(GlobalRank.cumSum(e, Seq($"id"), $"id", "c").count() == 0)
    assert(GlobalRank.cumMax(e, Seq($"id"), $"id", "m").count() == 0)
    assert(GlobalRank.lead1(e.select($"id"), "id", "n").count() == 0)
    assert(GlobalRank.lag1(e, "id", $"id", "p").count() == 0)
  }

  test("plans stay bucket-partitioned: no SinglePartition exchange") {
    for (out <- Seq(
        GlobalRank.rowNumber(df, Seq($"v".desc, $"id"), "rn", 8),
        GlobalRank.cumSum(df, Seq($"id"), $"dec", "c", 8),
        GlobalRank.cumMax(df, Seq($"id"), $"id", "m", 8),
        GlobalRank.lead1(df.select($"id"), "id", "nxt", 8),
        GlobalRank.lag1(df, "id", $"id", "p", 8))) {
      val p = out.queryExecution.executedPlan.toString
      assert(!p.contains("SinglePartition"), p)
      assert(p.contains("Window"), "two-level form still uses a bucket window")
    }
  }
}
