package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

/** SummaryNavigationRewrite: fires on exactly the additive-subset shape,
  * refuses everything else, and the rewritten plan is value-identical to
  * the rule-off plan (the bit-identity contract every injected rule in
  * this library carries).
  */
class SummaryNavigationRewriteSpec extends AnyFunSuite {
  private lazy val base = SparkTestSession.spark

  private val factPath = "/root/testdata/sf0.001/lineitem.parquet"

  private def navSession() = {
    val s = base.newSession()
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ SummaryNavigationRewrite
    s.conf.set("spark.graft.summaryNav.enabled", "true")
    s
  }

  private def withSummary[A](s: org.apache.spark.sql.SparkSession)(
      body: String => A): A = {
    val sumDir = java.nio.file.Files
      .createTempDirectory("sumnav").toString + "/t"
    SummaryRegistry.build(s, SummaryDef(factPath, sumDir,
      Seq("l_returnflag", "l_linestatus"),
      Seq(SummaryMeasure("sum_qty", "sum", "l_quantity",
          Some(DecimalType(18, 2))),
        SummaryMeasure("sum_lines", "sum", "l_linenumber"),
        SummaryMeasure("n_rows", "count", ""))))
    try body(sumDir) finally SummaryRegistry.unregister(factPath)
  }

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
    }.flatten

  private def usedSummary(df: DataFrame, sumDir: String): Boolean = {
    val ps = scanPaths(df)
    ps.exists(_.contains("sumnav")) && !ps.exists(_.contains("lineitem"))
  }

  private def sameValues(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("fires: subset regroup with sum(cast), sum(col), count(*)") {
    val s = navSession()
    withSummary(s) { sumDir =>
      def q(sess: org.apache.spark.sql.SparkSession) =
        sess.read.parquet(factPath)
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("sq"),
            sum(col("l_linenumber")).as("sl"),
            count(lit(1)).as("n"))
      val on = q(s)
      assert(usedSummary(on, sumDir), s"plan did not navigate: ${scanPaths(on)}")
      val onRows = on.localCheckpoint()
      s.conf.set("spark.graft.summaryNav.enabled", "false")
      assert(sameValues(onRows, q(s)), "rewritten result diverged from rule-off")
    }
  }

  test("fires: GLOBAL aggregate (empty grouping is a subset too)") {
    val s = navSession()
    withSummary(s) { sumDir =>
      val on = s.read.parquet(factPath)
        .agg(count(lit(1)).as("n"),
          sum(col("l_linenumber")).as("sl"))
      assert(usedSummary(on, sumDir))
      val onRows = on.localCheckpoint()
      s.conf.set("spark.graft.summaryNav.enabled", "false")
      assert(sameValues(onRows, s.read.parquet(factPath)
        .agg(count(lit(1)).as("n"), sum(col("l_linenumber")).as("sl"))))
    }
  }

  test("fires through plain SQL over a temp view (the SQL-user path)") {
    val s = navSession()
    withSummary(s) { sumDir =>
      s.read.parquet(factPath).createOrReplaceTempView("fact_li_sqlnav")
      def q() = s.sql(
        """SELECT l_returnflag, COUNT(*) AS n,
          |  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
          |FROM fact_li_sqlnav GROUP BY l_returnflag""".stripMargin)
      val on = q()
      assert(usedSummary(on, sumDir), s"SQL path did not navigate: ${scanPaths(on)}")
      val onRows = on.localCheckpoint()
      s.conf.set("spark.graft.summaryNav.enabled", "false")
      assert(sameValues(onRows, q()))
    }
  }

  test("refuses: a Filter below the aggregate (partials cannot answer it)") {
    val s = navSession()
    withSummary(s) { sumDir =>
      val q = s.read.parquet(factPath)
        .filter(col("l_quantity") > 10)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      assert(!usedSummary(q, sumDir), "must stand down on filtered shapes")
      assert(scanPaths(q).exists(_.contains("lineitem")))
    }
  }

  test("refuses: non-additive aggregates (avg, count distinct)") {
    val s = navSession()
    withSummary(s) { sumDir =>
      val avgQ = s.read.parquet(factPath)
        .groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a"))
      assert(!usedSummary(avgQ, sumDir), "AVG is not additive")
      val cdQ = s.read.parquet(factPath)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_linestatus")).as("cd"))
      assert(!usedSummary(cdQ, sumDir), "COUNT DISTINCT is not additive")
    }
  }

  test("refuses: grouping key outside the summary's grouping set") {
    val s = navSession()
    withSummary(s) { sumDir =>
      val q = s.read.parquet(factPath)
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      assert(!usedSummary(q, sumDir),
        "finer grouping than the summary cannot be answered from it")
    }
  }

  test("refuses: unregistered measure column or different cast") {
    val s = navSession()
    withSummary(s) { sumDir =>
      val unreg = s.read.parquet(factPath)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("x"))
      assert(!usedSummary(unreg, sumDir), "l_extendedprice is not registered")
      val wrongCast = s.read.parquet(factPath)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast(DecimalType(20, 4))).as("x"))
      assert(!usedSummary(wrongCast, sumDir),
        "a different cast is a different aggregate")
    }
  }

  test("conf off: registration alone never changes a plan") {
    val s = navSession()
    s.conf.set("spark.graft.summaryNav.enabled", "false")
    withSummary(s) { sumDir =>
      val q = s.read.parquet(factPath)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      assert(!usedSummary(q, sumDir))
      assert(scanPaths(q).exists(_.contains("lineitem")))
    }
  }

  test("registration refuses double sums (order-dependent, not bit-exact)") {
    intercept[IllegalArgumentException] {
      SummaryRegistry.register(SummaryDef(factPath, "/tmp/never",
        Seq("l_returnflag"),
        Seq(SummaryMeasure("bad", "sum", "l_quantity", Some(DoubleType)))))
    }
    intercept[IllegalArgumentException] {
      SummaryRegistry.register(SummaryDef(factPath, "/tmp/never",
        Seq("l_returnflag"), Seq(SummaryMeasure("bad", "avg", "l_quantity"))))
    }
  }
}
