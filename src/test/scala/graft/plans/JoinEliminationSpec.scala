package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite

/** JoinEliminationRewrite: conf-gated left-join elimination under declared
  * unique keys. Pins that the join truly disappears when (and only when)
  * sound: left outer, right side unused above the join, a declared-unique
  * right key pinned to the left — and that the rewritten result is
  * row-identical to the rule-off join on real data, including orphan left
  * rows (the case that makes INNER elimination unsound).
  */
class JoinEliminationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def ruleSession(enabled: Boolean,
      keys: String = "c_custkey"): SparkSession = {
    val s = spark.newSession()
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ JoinEliminationRewrite
    s.conf.set("spark.graft.joinElim.enabled", enabled.toString)
    s.conf.set("spark.graft.joinElim.uniqueKeys", keys)
    graft.Tables.orders(s, dir).createOrReplaceTempView("je_orders")
    graft.Tables.customer(s, dir).createOrReplaceTempView("je_customer")
    s
  }

  private def hasJoin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst { case j: Join => j }.nonEmpty

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val unusedDimAgg =
    """SELECT o_orderstatus, COUNT(*) AS n, SUM(o_orderkey) AS s
      |FROM je_orders o LEFT JOIN je_customer c ON o.o_custkey = c.c_custkey
      |GROUP BY o_orderstatus""".stripMargin

  test("fires: unused left-joined dimension vanishes, result identical") {
    val on = ruleSession(enabled = true)
    val off = ruleSession(enabled = false)
    val dfOn = on.sql(unusedDimAgg)
    val dfOff = off.sql(unusedDimAgg)
    assert(!hasJoin(dfOn), "join should be eliminated")
    assert(hasJoin(dfOff), "rule off must keep the join")
    assert(canon(dfOn) == canon(dfOff))
  }

  test("fires on the project shape too (no aggregate above the join)") {
    val on = ruleSession(enabled = true)
    val df = on.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM je_orders o LEFT JOIN je_customer c ON o.o_custkey = c.c_custkey
        |WHERE o_orderkey < 100""".stripMargin)
    assert(!hasJoin(df))
    val off = ruleSession(enabled = false)
    assert(canon(df) == canon(off.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM je_orders o LEFT JOIN je_customer c ON o.o_custkey = c.c_custkey
        |WHERE o_orderkey < 100""".stripMargin)))
  }

  test("orphan left rows survive: elimination keeps LEFT OUTER semantics") {
    // plant orphans: custkeys no customer has — with the join dropped the
    // rows must STILL be there (as they would be under left outer). The
    // shifted key stays an attribute=attribute condition; a LITERAL key
    // would be folded into a right-side filter with a condition-less join,
    // a shape the rule deliberately leaves alone.
    val on = ruleSession(enabled = true)
    on.sql("""SELECT o_orderkey, o_custkey + 1000000 AS o_custkey,
             |  o_orderstatus FROM je_orders""".stripMargin)
      .createOrReplaceTempView("je_orphans")
    val df = on.sql(
      """SELECT o_orderkey FROM je_orphans o
        |LEFT JOIN je_customer c ON o.o_custkey = c.c_custkey""".stripMargin)
    assert(!hasJoin(df))
    assert(df.count() == graft.Tables.orders(spark, dir).count())
  }

  test("stands down: inner join, used dim column, undeclared key, off flag") {
    val on = ruleSession(enabled = true)
    // inner join filters orphans — eliminating it would be unsound
    assert(hasJoin(on.sql(
      """SELECT o_orderstatus, COUNT(*) AS n
        |FROM je_orders o JOIN je_customer c ON o.o_custkey = c.c_custkey
        |GROUP BY o_orderstatus""".stripMargin)))
    // dimension column referenced above the join — must keep it
    assert(hasJoin(on.sql(
      """SELECT c.c_mktsegment, COUNT(*) AS n
        |FROM je_orders o LEFT JOIN je_customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment""".stripMargin)))
    // join key not declared unique — duplicates possible, must keep it
    val undeclared = ruleSession(enabled = true, keys = "s_suppkey")
    assert(hasJoin(undeclared.sql(unusedDimAgg)))
    // rule disabled
    assert(hasJoin(ruleSession(enabled = false).sql(unusedDimAgg)))
  }

  test("non-unique declared key would duplicate rows: rule needs the equality") {
    // condition with no equality on the declared key (range predicate):
    // m > 1 matches possible → must not eliminate
    val on = ruleSession(enabled = true)
    assert(hasJoin(on.sql(
      """SELECT o_orderkey FROM je_orders o
        |LEFT JOIN je_customer c ON c.c_custkey > o.o_custkey""".stripMargin)))
  }
}
