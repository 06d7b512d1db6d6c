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
}
