package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-stability suite — ports spec/functional/partitioning_spec.rb:
  * same key ⇒ same partition across ops; keys spread across partitions.
  */
class KafkaPartitionerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("murmur2 matches Kafka's published test vectors") {
    // vectors from the Kafka protocol documentation / client compat tables
    def m(s: String) = KafkaPartitioner.murmur2(s.getBytes("UTF-8"))
    assert(m("21") == -973932308)
    assert(m("foobar") == -790332482)
    assert(m("a-little-bit-long-string") == -985981536)
    assert(m("a-little-bit-longer-string") == -1486304829)
    assert(m("lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8") == -58897971)
  }

  test("same key always lands on the same partition; spread is even-ish") {
    import spark.implicits._
    val env = graft.cdc.ChangelogGen.fromEvents(spark, "/root/testdata/sf0.001")
    val parts = env.toDF()
      .select(col("key"), GraftFunctions.kafka_partition(
        col("key").cast("binary"), lit(4)).as("p"))
    // stability: one distinct partition per key
    val perKey = parts.groupBy("key")
      .agg(countDistinct(col("p")).as("np"))
    assert(perKey.filter(col("np") =!= 1).count() == 0)
    // spread: all 4 partitions used (150 keys)
    assert(parts.select("p").distinct().count() == 4)
  }

  test("SQL registration") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("SELECT kafka_partition(CAST('42' AS BINARY), 8) AS p")
      .collect().head.getInt(0)
    assert(r == KafkaPartitioner.partitionFor("42".getBytes("UTF-8"), 8))
  }
}
