package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("withExtensions exposes every graft function to pure SQL") {
    // extensions bind at session build: clear the shared default so
    // getOrCreate builds a NEW session (over the same SparkContext) instead
    // of returning the shared one; never stop() it (shared context).
    val old = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT avro_safe_name('a b') AS s,
          |  schema_id_of(schema_id_frame(9, CAST('x' AS BINARY))) AS id,
          |  doc_fingerprint('abc') AS fp,
          |  simhash('a b a') AS sh,
          |  kafka_partition(CAST('k' AS BINARY), 16) AS p,
          |  size(minhash_signature('a b c d e')) AS nsig""".stripMargin)
        .collect().head
      assert(row.getString(0) == "a_20_b")
      assert(row.getInt(1) == 9)
      assert(row.getLong(2) == (('a' * 131 + 'b') * 131 + 'c') % 2147483647L)
      assert(row.getLong(3) >= 0)
      assert(row.getInt(4) == graft.functions.KafkaPartitioner
        .partitionFor("k".getBytes("UTF-8"), 16))
      assert(row.getInt(5) == 16)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      old.foreach(SparkSession.setDefaultSession)
    }
  }

  test("MetadataCountRewrite: fires on bare parquet count(*), guards hold") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.spark
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations =
      s2.experimental.extraOptimizations :+ graft.plans.MetadataCountRewrite
    val dir = "/root/testdata/sf0.001"
    def isLocal(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collectFirst {
        case l: LocalRelation => l }.nonEmpty
    def counted(df: org.apache.spark.sql.DataFrame) = df.head().getLong(0)

    // off by default: no rewrite, result exact
    val off = s2.read.parquet(s"$dir/orders.parquet").agg(count(lit(1)))
    assert(!isLocal(off))
    val exact = counted(off)

    s2.conf.set("spark.graft.metaCount.enabled", "true")
    // fires, and the footer sum equals the scanned count
    val on = s2.read.parquet(s"$dir/orders.parquet").agg(count(lit(1)))
    assert(isLocal(on), on.queryExecution.optimizedPlan.toString)
    assert(counted(on) == exact)
    // multiple count(*) columns all get the same footer sum
    val multi = s2.read.parquet(s"$dir/orders.parquet")
      .agg(count(lit(1)).as("a"), count(lit(1)).as("b"))
    assert(isLocal(multi))
    assert(multi.head() == org.apache.spark.sql.Row(exact, exact))
    // stand-down guards: any filter, grouping, distinct, or non-count agg
    val r = s2.read.parquet(s"$dir/orders.parquet")
    assert(!isLocal(r.filter(col("o_orderkey") > 100).agg(count(lit(1)))))
    assert(!isLocal(r.groupBy(col("o_orderstatus")).agg(count(lit(1)))))
    assert(!isLocal(r.agg(countDistinct(col("o_custkey")))))
    assert(!isLocal(r.agg(count(lit(1)), max(col("o_orderkey")))))
    s2.conf.set("spark.graft.metaCount.enabled", "false")
  }
}
