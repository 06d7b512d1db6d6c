package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ApproxDistinctRewrite: the conf-gated COUNT(DISTINCT) → HLL++ sketch
  * substitution. Pins the gate (off = byte-identical exact plan), the
  * scope guards (only single-column COUNT DISTINCT rewrites), FILTER
  * preservation, and the accuracy bound on real data.
  */
class ApproxDistinctRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Fresh session with the rule appended (q45's runtime pattern) so the
    * conf never leaks into sibling queries.
    */
  private def ruleSession(enabled: Boolean): SparkSession = {
    val s = spark.newSession()
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ ApproxDistinctRewrite
    s.conf.set("spark.graft.approxDistinct.enabled", enabled.toString)
    s
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString.toLowerCase

  test("off by default: plan keeps the exact distinct count, result exact") {
    val s = ruleSession(enabled = false)
    graft.Tables.orders(s, dir).createOrReplaceTempView("adr_orders")
    val df = s.sql(
      "SELECT COUNT(DISTINCT o_custkey) AS n FROM adr_orders")
    assert(!plan(df).contains("approx_count_distinct"))
    val exact = graft.Tables.orders(spark, dir)
      .select(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(df.head.getLong(0) == exact)
  }

  test("on: sketch replaces the distinct count; estimate within 3·rsd") {
    val s = ruleSession(enabled = true)
    graft.Tables.orders(s, dir).createOrReplaceTempView("adr_orders")
    val df = s.sql(
      "SELECT COUNT(DISTINCT o_custkey) AS n FROM adr_orders")
    val p = plan(df)
    assert(p.contains("approx_count_distinct"), s"rewrite must fire:\n$p")
    assert(!p.contains("count(distinct"), s"no exact distinct must remain:\n$p")
    val exact = graft.Tables.orders(spark, dir)
      .select(countDistinct(col("o_custkey"))).head.getLong(0)
    val apx = df.head.getLong(0)
    assert(math.abs(apx - exact) <= exact * 0.15, s"$apx vs $exact")
  }

  test("scope guards: multi-column and SUM(DISTINCT) keep exact semantics") {
    val s = ruleSession(enabled = true)
    graft.Tables.orders(s, dir).createOrReplaceTempView("adr_orders")
    val multi = s.sql(
      "SELECT COUNT(DISTINCT o_custkey, o_orderstatus) AS n FROM adr_orders")
    assert(!plan(multi).contains("approx_count_distinct"),
      "multi-column COUNT DISTINCT must stay exact")
    val sumD = s.sql("SELECT SUM(DISTINCT o_custkey) AS n FROM adr_orders")
    assert(!plan(sumD).contains("approx_count_distinct"),
      "SUM(DISTINCT) changes the VALUE, never rewrite it")
    // and both still compute the exact answers
    val base = graft.Tables.orders(spark, dir)
    assert(multi.head.getLong(0) ==
      base.select(countDistinct(col("o_custkey"), col("o_orderstatus")))
        .head.getLong(0))
    assert(sumD.head.getLong(0) ==
      base.select(sum_distinct(col("o_custkey"))).head.getLong(0))
  }

  test("FILTER-qualified distinct is never corrupted (rewrite or exact)") {
    // position-dependent: injected via GraftExtensions the rule sees the
    // AggregateExpression with its filter intact (and preserves it); at
    // the END of optimization (extraOptimizations, this harness) Spark has
    // already Expand-rewritten a FILTERed distinct, so the rule must leave
    // the expanded plan alone and the result stays exact. Either way the
    // answer is within the sketch bound — corruption fails this test.
    val s = ruleSession(enabled = true)
    graft.Tables.orders(s, dir).createOrReplaceTempView("adr_orders")
    val df = s.sql(
      """SELECT COUNT(DISTINCT o_custkey)
        |  FILTER (WHERE o_orderstatus = 'F') AS n
        |FROM adr_orders""".stripMargin)
    val exact = graft.Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(math.abs(df.head.getLong(0) - exact) <= exact * 0.15)
  }
}
