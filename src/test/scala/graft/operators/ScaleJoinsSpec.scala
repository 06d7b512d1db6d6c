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
    for (t <- Seq("b_lineitem", "b_orders")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get("spark-warehouse", t)
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
