package graft

import graft.cdc._
import graft.streaming.CdcPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Capstone: the COMPLETE reference lifecycle in one flow (SURVEY §3.1/3.2) —
  *
  *   snapshot (xid=0) → wire-encoded txn frames → decode → error guard →
  *   update split → streaming compaction → per-table MERGE sink → state read
  *
  * with an at-least-once redelivery in the middle. Each stage is tested in
  * isolation elsewhere; this pins the seams.
  */
class EndToEndSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("wire frames → pipeline → materialized state, with redelivery") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val table = "public.accounts"
    val relid = AvroFrame.relidOf(table)

    // --- source side: snapshot + two committed transactions on the wire -----
    val base = Seq((1L, 100.0), (2L, 200.0)).toDF("id", "balance")
    val snapshot = CdcPipeline.snapshotEnvelopes(base, table, Seq("id")).collect().toSeq

    def ev(op: String, id: Long, seq: Long, after: String) =
      CdcEvent(op, table, 0, 0, seq, s"""{"id":$id}""", null, after)
    val txn1 = AvroFrame.encodeTxn(xid = 11, lsn = 100, Seq(
      ev(Op.Update, 1, 0, """{"id":1,"balance":150.0}"""),
      ev(Op.Insert, 3, 1, """{"id":3,"balance":300.0}""")))
    val txn2 = AvroFrame.encodeTxn(xid = 12, lsn = 200, Seq(
      ev(Op.Delete, 2, 0, null)))

    // --- consumer side: decode frames (strict) and stream them through ------
    val decoded = Seq(txn1, txn2, txn2 /* at-least-once redelivery */)
      .flatMap(bytes => AvroFrame.decodeFrame(bytes, Map(relid -> table))._3)
    assert(decoded.count(_.op == Op.Delete) == 2) // redelivered delete present

    val input = MemoryStream[CdcEvent]
    val out = java.nio.file.Files.createTempDirectory("e2e").toString
    val ckpt = out + "/ckpt"
    def runBatch(evs: Seq[CdcEvent]): Unit = {
      input.addData(evs)
      val q = CdcPipeline.writeLatestState(
        CdcPipeline.latestStateStream(input.toDS(), ErrorPolicy.Log,
          maxRecordBytes = 1024), out, ckpt).start()
      q.awaitTermination()
    }
    runBatch(snapshot)  // phase 1: consistent snapshot
    runBatch(decoded)   // phase 2: stream (incl. the duplicate frame)

    // --- state side: the materialized table is exactly the expected world ---
    val state = MaterializedTable
      .read(spark, s"$out/${functions.AvroSafeName.sanitize(table)}")
      .select(get_json_object(col("after"), "$.id").cast("long").as("id"),
        get_json_object(col("after"), "$.balance").cast("double").as("balance"))
      .as[(Long, Double)].collect().toMap
    assert(state == Map(1L -> 150.0, 3L -> 300.0)) // 2 deleted, 1 updated, 3 inserted

    // --- and equals a from-scratch batch replay of the same changelog -------
    val replay = LatestState.batch(
      (snapshot ++ decoded).toDF(), Seq("table", "key"), Seq("lsn", "seq"))
      .select(get_json_object(col("after"), "$.id").cast("long"),
        get_json_object(col("after"), "$.balance").cast("double"))
      .as[(Long, Double)].collect().toMap
    assert(state == replay)
  }

  test("produce → consume symmetry: Kafka frames round-trip the compacted state") {
    import spark.implicits._
    import graft.streaming.KafkaSink
    val table = "public.accounts"

    // compacted changelog (incl. a tombstone) → producer frames
    val compacted = Seq(
      CdcEvent(Op.Insert, table, 10, 1, 0, """{"id":1}""", null, """{"id":1,"balance":150.0}"""),
      CdcEvent(Op.Insert, table, 11, 1, 1, """{"id":3}""", null, """{"id":3,"balance":300.0}"""),
      CdcEvent(Op.Delete, table, 12, 2, 0, """{"id":2}""", null, null)).toDS()
    val registry = new MockSchemaRegistry
    val ids = KafkaSink.registerAll(Map(table -> KafkaSink.TopicSchemas(
      PgTypes.schemaFor(Seq("id" -> PgTypes.Oid.Int8)).json,
      PgTypes.schemaFor(Seq("id" -> PgTypes.Oid.Int8,
        "balance" -> PgTypes.Oid.Float8)).json)), "bw", registry, ErrorPolicy.Exit)
    val produced = KafkaSink.producerRows(compacted, ids, numPartitions = 8).collect()

    // consumer side: unframe key/value exactly as a downstream reader would —
    // Kafka log compaction keeps the newest record per key; a null value is
    // the deletion marker (README.md:288–291)
    val consumed = produced.map { r =>
      val key = new String(graft.functions.RegistryFrame.strip(
        r.getAs[Array[Byte]]("key")), "UTF-8")
      val value = Option(r.getAs[Array[Byte]]("value"))
        .map(v => new String(graft.functions.RegistryFrame.strip(v), "UTF-8"))
      key -> value
    }.toMap
    assert(consumed == Map(
      """{"id":1}""" -> Some("""{"id":1,"balance":150.0}"""),
      """{"id":3}""" -> Some("""{"id":3,"balance":300.0}"""),
      """{"id":2}""" -> None))   // tombstone survives the wire as null

    // every frame decodes with the schema id the registry issued
    assert(produced.forall(r => graft.functions.RegistryFrame.schemaId(
      r.getAs[Array[Byte]]("key")) == ids(table).keyId))
  }
}
