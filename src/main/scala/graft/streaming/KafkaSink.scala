package graft.streaming

import graft.cdc._
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The Kafka produce surface in ONE composition point — ≙ the reference's
  * producer tail (kafka/bottledwater.c:559–643):
  *
  *   - topic per table, `[prefix].[pg_schema].[table]` with `public` omitted
  *     and identifiers avro-sanitized (kafka/bottledwater.c:386–415);
  *   - key/value schemas registered up front per topic, messages framed as
  *     `\0 + 4-byte schema id + payload` (kafka/registry.c:63–87);
  *   - DELETE ⇒ null value = compaction tombstone (kafka/bottledwater.c:533–541);
  *   - unkeyed deletes dropped (:537–540);
  *   - partition = murmur2(framed key bytes) % n — what Kafka's default
  *     partitioner computes on the produced key, pinned explicitly so the
  *     per-key ordering guarantee (README.md:384–398) is visible in the plan.
  *
  * The environment has no broker and no spark-sql-kafka jar, so
  * [[producerRows]] returns the exact (topic, partition, key, value) frame
  * the `kafka` sink format consumes — contract-tested against the
  * partitioner/framing/tombstone specs — and [[writer]] is the final
  * aim-at-a-broker wiring (source resolution happens at `start()`, on a
  * cluster that has the connector jar).
  */
object KafkaSink {

  /** Key/value schema JSONs for one envelope table ("pg_schema.table"). */
  final case class TopicSchemas(keySchemaJson: String, valueSchemaJson: String)

  /** Registered identity of one topic: ids index the registry's schemas. */
  final case class TopicIds(topic: String, keyId: Int, valueId: Int)

  /** Topic name for an envelope table name (split on the FIRST '.', the
    * shape snapshotEnvelopes/ChangelogGen write).
    */
  def topicOf(prefix: String, envelopeTable: String): String = {
    val i = envelopeTable.indexOf('.')
    if (i < 0) TopicRouter.topicName(prefix, null, envelopeTable)
    else TopicRouter.topicName(prefix, envelopeTable.substring(0, i),
      envelopeTable.substring(i + 1))
  }

  /** Register every table's key+value schema up front (kafka/table_mapper.c:58–147),
    * under the reference's subject naming `{topic}-key|-value`. Registry
    * failure follows the error policy: Exit aborts before anything is
    * produced; Log drops the table (its messages are skipped downstream by
    * the routing join in [[producerRows]]) and keeps the pipeline alive.
    * Driver-side, O(tables).
    */
  def registerAll(tableSchemas: Map[String, TopicSchemas], prefix: String,
      registry: MockSchemaRegistry, policy: ErrorPolicy): Map[String, TopicIds] = {
    // The registration point knows the FULL table set — the right moment for
    // the deterministic relid-collision check (the reference's OIDs are
    // unique by construction; our name hash is not): fail here on the driver,
    // before anything is produced, instead of maybe-on-some-executor later.
    AvroFrame.validateRelids(tableSchemas.keys.toSeq)
    ErrorPolicy.perTable(tableSchemas.keys.toSeq.sorted, policy,
        "schema registration") { table =>
      val topic = topicOf(prefix, table)
      val s = tableSchemas(table)
      TopicIds(topic,
        keyId = registry.register(topic, isKey = true, s.keySchemaJson),
        valueId = registry.register(topic, isKey = false, s.valueSchemaJson))
    }
  }

  /** Compose a compacted (or raw) envelope stream into producer rows:
    * (topic STRING, partition INT, key BINARY, value BINARY) — exactly the
    * columns `format("kafka")` consumes. Works identically on batch and
    * streaming Datasets (narrow transforms only; the routing table is a
    * broadcast dimension of O(registered tables)).
    *
    * Tables absent from `ids` (log-policy registration failures) drop out via
    * the inner join — produced nowhere, pipeline alive. Unkeyed inserts keep
    * a null key (Kafka assigns the partition); unkeyed deletes are dropped.
    */
  def producerRows(envelopes: Dataset[CdcEvent], ids: Map[String, TopicIds],
      numPartitions: Int): DataFrame = {
    val spark = envelopes.sparkSession
    import spark.implicits._
    val routing = ids.toSeq
      .map { case (t, i) => (t, i.topic, i.keyId, i.valueId) }
      .toDF("_table", "topic", "_key_id", "_value_id")
    // row ops only: decodeFrame surfaces TableSchema messages as Op.Schema
    // events (and txn brackets exist upstream) — control messages go to the
    // registry, never to the data topic (the reference produces only row
    // events, kafka/bottledwater.c:466–541)
    val rowEvents = envelopes.filter(e => Op.rowOps.contains(e.op))
    CdcPipeline.dropUnkeyedDeletes(rowEvents).toDF()
      .join(broadcast(routing), col("table") === col("_table"))
      .withColumn("key",
        GraftFunctions.schema_id_frame(col("_key_id"), col("key").cast("binary")))
      .withColumn("value",
        GraftFunctions.schema_id_frame(col("_value_id"), col("after").cast("binary")))
      .withColumn("partition",
        GraftFunctions.kafka_partition(col("key"), lit(numPartitions)))
      .select(col("topic"), col("partition"), col("key"), col("value"))
  }

  /** The single point a user aims at a real broker: producer rows →
    * `format("kafka")`. Unresolvable in this environment (no connector jar —
    * resolution happens at `start()`), kept as the composed shape so
    * switching to a live cluster is exactly one `.start()`.
    */
  def writer(producerRows: DataFrame, brokers: String,
      checkpointDir: String): DataStreamWriter[Row] =
    producerRows.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("checkpointLocation", checkpointDir)
}
