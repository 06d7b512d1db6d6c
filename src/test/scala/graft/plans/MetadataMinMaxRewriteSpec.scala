package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MetadataMinMaxRewrite: conf-gated footer-statistics MIN/MAX/COUNT.
  * Pins the fire/stand-down scope and the bit-identity contract (on ≡ off)
  * across types, nulls, empties, and unsupported shapes.
  */
class MetadataMinMaxRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def ruleSession(enabled: Boolean): SparkSession = {
    val s = spark.newSession()
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ MetadataMinMaxRewrite
    s.conf.set("spark.graft.metaMinMax.enabled", enabled.toString)
    s
  }

  private def fired(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.nonEmpty

  private def aggAll(s: SparkSession): DataFrame =
    graft.Tables.orders(s, dir).agg(
      count(lit(1)).as("n"),
      min(col("o_orderkey")).as("mn_k"), max(col("o_orderkey")).as("mx_k"))

  test("fires on bare-scan min/max/count and is bit-identical to rule-off") {
    val on = aggAll(ruleSession(enabled = true))
    val off = aggAll(ruleSession(enabled = false))
    assert(fired(on), "expected the footer rewrite to fire")
    assert(!fired(off))
    assert(on.collect().toSeq == off.collect().toSeq)
  }

  test("stands down on filters, unsupported types, and expressions") {
    val s = ruleSession(enabled = true)
    val t = graft.Tables.orders(s, dir)
    assert(!fired(t.filter(col("o_orderkey") > 100)
      .agg(min(col("o_orderkey")).as("m"))), "filter must disable it")
    assert(!fired(t.agg(min(col("o_totalprice")).as("m"))),
      "double stats are NaN-unsafe — stand down")
    assert(!fired(t.agg(min(col("o_orderstatus")).as("m"))),
      "string footer stats can be writer-truncated (no exactness flag) — " +
        "valid for pruning, not for answering MIN/MAX verbatim")
    assert(!fired(t.agg(min(col("o_orderdate")).as("m"))),
      "timestamp logical types stand down")
    assert(!fired(t.agg(min(col("o_orderkey") + 1).as("m"))),
      "only bare attributes qualify")
    assert(!fired(t.agg(count(lit(1)).as("n"))),
      "pure counts belong to MetadataCountRewrite")
    assert(!fired(t.groupBy(col("o_orderstatus"))
      .agg(min(col("o_orderkey")).as("m"))), "grouped aggregates stand down")
  }

  test("all-null columns answer NULL; empty tables answer (0, NULL) — exactly as rule-off") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mmx").toString
    Seq((1L, Option.empty[Long]), (2L, None), (3L, None))
      .toDF("id", "v").write.parquet(s"$tmp/nulls")
    spark.range(0).selectExpr("id", "CAST(null AS STRING) AS s")
      .write.parquet(s"$tmp/empty")
    for (enabled <- Seq(true, false)) {
      val s = ruleSession(enabled)
      val nulls = s.read.parquet(s"$tmp/nulls")
        .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      assert(fired(nulls) == enabled)
      assert(nulls.collect().toSeq.map(_.toSeq) == Seq(Seq(3L, null, null)))
      val empty = s.read.parquet(s"$tmp/empty")
        .agg(count(lit(1)).as("n"), min(col("s")).as("mn"))
      assert(empty.collect().toSeq.map(_.toSeq) == Seq(Seq(0L, null)))
    }
  }

  test("partition columns stand down (not in footers)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mmx2").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "p")
      .write.partitionBy("p").parquet(s"$tmp/part")
    val s = ruleSession(enabled = true)
    val df = s.read.parquet(s"$tmp/part").agg(min(col("p")).as("m"))
    assert(!fired(df))
    assert(df.collect()(0).getString(0) == "a")
    // data columns of a partitioned table still fire
    val df2 = s.read.parquet(s"$tmp/part").agg(min(col("id")).as("m"))
    assert(fired(df2) && df2.collect()(0).getLong(0) == 1L)
  }
}
