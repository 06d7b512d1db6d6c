package graft.streaming

import graft.SparkTestSession
import graft.cdc._
import graft.functions.KafkaPartitioner
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the single Kafka-producer composition point — the
  * observable produce behaviors of kafka/bottledwater.c:559–643 pinned by
  * spec/functional/message_spec.rb (tombstones, unkeyed) and
  * partitioning_spec.rb:24–111 (same key ⇒ same partition).
  */
class KafkaSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val keySchema = PgTypes.schemaFor(Seq("id" -> PgTypes.Oid.Int8)).json
  private val valSchema = PgTypes.schemaFor(Seq(
    "id" -> PgTypes.Oid.Int8, "u" -> PgTypes.Oid.Text)).json

  private def registered(): (MockSchemaRegistry, Map[String, KafkaSink.TopicIds]) = {
    val registry = new MockSchemaRegistry
    val ids = KafkaSink.registerAll(
      Map("public.users" -> KafkaSink.TopicSchemas(keySchema, valSchema),
        "crm.accounts" -> KafkaSink.TopicSchemas(keySchema, valSchema)),
      prefix = "bw", registry, ErrorPolicy.Exit)
    (registry, ids)
  }

  test("topic naming: public omitted, other schemas kept, prefix applied") {
    val (_, ids) = registered()
    assert(ids("public.users").topic == "bw.users")
    assert(ids("crm.accounts").topic == "bw.crm.accounts")
    // same (key, value) schema pair ⇒ same global ids on both topics
    // (Confluent id identity, kafka/table_mapper.c:277)
    assert(ids("public.users").keyId == ids("crm.accounts").keyId)
    assert(ids("public.users").valueId == ids("crm.accounts").valueId)
    assert(ids("public.users").keyId != ids("public.users").valueId)
  }

  test("producer rows: framing, tombstones, unkeyed + unregistered handling") {
    import spark.implicits._
    val (_, ids) = registered()
    val envelopes = Seq(
      CdcEvent(Op.Insert, "public.users", 1, 0, 0, """{"id":1}""", null, """{"id":1,"u":"ada"}"""),
      CdcEvent(Op.Delete, "public.users", 2, 0, 0, """{"id":2}""", null, null),
      CdcEvent(Op.Insert, "public.users", 3, 0, 0, null, null, """{"u":"unkeyed"}"""),
      CdcEvent(Op.Delete, "public.users", 4, 0, 0, null, null, null),    // unkeyed delete: dropped
      CdcEvent(Op.Insert, "crm.accounts", 5, 0, 0, """{"id":9}""", null, """{"id":9,"u":"x"}"""),
      CdcEvent(Op.Insert, "ops.unregistered", 6, 0, 0, """{"id":1}""", null, """{"id":1}"""),
      // control message (as decodeFrame surfaces them): must NOT be produced
      CdcEvent(Op.Schema, "public.users", 7, 0, 0, "424242", null, """{"type":"struct"}"""))
      .toDS()

    val rows = KafkaSink.producerRows(envelopes, ids, numPartitions = 16)
    assert(rows.columns.toSeq == Seq("topic", "partition", "key", "value"))
    val out = rows.collect()

    // unkeyed delete and unregistered table are both absent
    assert(out.length == 4)
    assert(!out.exists(_.getString(0).contains("unregistered")))

    val keyed = out.find(r => r.getString(0) == "bw.users" &&
      r.get(3) != null && r.get(2) != null).get
    val keyBytes = keyed.getAs[Array[Byte]]("key")
    val valueBytes = keyed.getAs[Array[Byte]]("value")
    // registry wire framing roundtrip (kafka/registry.c:63–87)
    assert(graft.functions.RegistryFrame.schemaId(keyBytes) == ids("public.users").keyId)
    assert(new String(graft.functions.RegistryFrame.strip(keyBytes), "UTF-8") == """{"id":1}""")
    assert(graft.functions.RegistryFrame.schemaId(valueBytes) == ids("public.users").valueId)
    // partition = murmur2(framed key) % n, inside [0, n)
    assert(keyed.getInt(1) == KafkaPartitioner.partitionFor(keyBytes, 16))
    assert(out.forall(r => r.isNullAt(1) || (r.getInt(1) >= 0 && r.getInt(1) < 16)))

    // delete ⇒ null value (tombstone), key still framed
    val tombstone = out.find(r => r.get(3) == null).get
    assert(tombstone.get(2) != null)
    assert(new String(graft.functions.RegistryFrame.strip(
      tombstone.getAs[Array[Byte]]("key")), "UTF-8") == """{"id":2}""")

    // unkeyed insert flows with a null key and no pinned partition
    val unkeyed = out.find(r => r.get(2) == null).get
    assert(unkeyed.get(3) != null && unkeyed.isNullAt(1))
  }

  test("per-key partition stability: every change for a key lands together") {
    import spark.implicits._
    val (_, ids) = registered()
    val changes = (1 to 50).flatMap { i =>
      Seq(CdcEvent(Op.Insert, "public.users", i * 2L, 0, 0, s"""{"id":${i % 7}}""",
          null, s"""{"id":${i % 7},"u":"v$i"}"""),
        CdcEvent(Op.Update, "public.users", i * 2L + 1, 0, 0, s"""{"id":${i % 7}}""",
          null, s"""{"id":${i % 7},"u":"w$i"}"""))
    }.toDS()
    val perKey = KafkaSink.producerRows(changes, ids, numPartitions = 8)
      .select(col("key"), col("partition")).distinct()
      .groupBy("key").agg(countDistinct("partition").as("nparts"))
      .select("nparts").as[Long].collect()
    assert(perKey.nonEmpty && perKey.forall(_ == 1L))
  }

  test("writer composes the kafka-format shape without resolving the sink") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val (_, ids) = registered()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CdcEvent]
    val rows = KafkaSink.producerRows(input.toDS(), ids, 16)
    assert(rows.isStreaming)   // the same composition works on a stream
    val w = KafkaSink.writer(rows, "broker:9092", "/tmp/ckpt")
    assert(w != null)          // resolution of format("kafka") happens at start()
  }
}
