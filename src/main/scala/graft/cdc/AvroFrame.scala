package graft.cdc

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** Avro wire codec for CDC frames — behavioral twin of the reference's frame
  * protocol (ext/protocol.c:16–57): a Frame is a record holding an array of
  * union-typed messages with discriminants
  * {BeginTxn, CommitTxn, TableSchema, Insert, Update, Delete}
  * (ext/protocol.h:19–24). Row payloads ride as opaque bytes (here: UTF-8
  * JSON; in the reference: nested Avro), keys/old-rows are nullable unions,
  * exactly as the reference's tombstone semantics require.
  *
  * Built directly on Apache Avro (the jars Spark ships) — no code taken from
  * the reference; the schema below is derived from its documented shape.
  */
object AvroFrame {
  private val ns = "graft.cdc"

  val schemaJson: String =
    s"""{"type":"record","name":"Frame","namespace":"$ns","fields":[
       |  {"name":"msg","type":{"type":"array","items":[
       |    {"type":"record","name":"BeginTxn","fields":[{"name":"xid","type":"long"}]},
       |    {"type":"record","name":"CommitTxn","fields":[
       |      {"name":"xid","type":"long"},{"name":"lsn","type":"long"}]},
       |    {"type":"record","name":"TableSchema","fields":[
       |      {"name":"relid","type":"long"},
       |      {"name":"keySchema","type":["null","string"],"default":null},
       |      {"name":"rowSchema","type":"string"}]},
       |    {"type":"record","name":"Insert","fields":[
       |      {"name":"relid","type":"long"},
       |      {"name":"key","type":["null","bytes"],"default":null},
       |      {"name":"newRow","type":"bytes"}]},
       |    {"type":"record","name":"Update","fields":[
       |      {"name":"relid","type":"long"},
       |      {"name":"key","type":["null","bytes"],"default":null},
       |      {"name":"oldRow","type":["null","bytes"],"default":null},
       |      {"name":"newRow","type":"bytes"}]},
       |    {"type":"record","name":"Delete","fields":[
       |      {"name":"relid","type":"long"},
       |      {"name":"key","type":["null","bytes"],"default":null},
       |      {"name":"oldRow","type":["null","bytes"],"default":null}]}
       |  ]}}]}""".stripMargin

  lazy val schema: Schema = new Schema.Parser().parse(schemaJson)
  private def branch(name: String): Schema =
    schema.getField("msg").schema().getElementType.getTypes.asScala
      .find(_.getName == name).get
  private implicit class JListOps[T](l: java.util.List[T]) {
    def asScala: Seq[T] = { val b = Seq.newBuilder[T]; l.forEach(t => b += t); b.result() }
  }

  private def bb(s: String): java.nio.ByteBuffer =
    if (s == null) null
    else java.nio.ByteBuffer.wrap(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private def str(b: Any): String = b match {
    case null => null
    case buf: java.nio.ByteBuffer =>
      new String(buf.array(), buf.position(), buf.remaining(),
        java.nio.charset.StandardCharsets.UTF_8)
  }

  /** relid assignment for table names (stable hash — the reference uses PG
    * catalog OIDs, which have no analog here). The reference's OIDs are unique
    * by construction; a hash is not, so we detect collisions at assignment
    * time: if two distinct table names ever map to the same relid, encoding
    * fails loudly instead of silently routing events to the wrong table.
    *
    * SCOPE: this check is per-JVM and per-process-lifetime — encodeTxn runs
    * inside mapGroups on executors, each holding an independent registry that
    * is empty after a restart, so two colliding tables encoded on disjoint
    * executors (or in different runs) pass it silently. The deterministic
    * guarantee is [[validateRelids]], run once on the driver with the full
    * table set — auto-wired at every pipeline entry that knows its tables
    * (ChangelogGen.fromEvents, KafkaSink.registerAll,
    * CdcPipeline.writeLatestState's demux — cumulative over every table the
    * query has seen, so cross-batch collisions fail too).
    */
  private val relidRegistry = new java.util.concurrent.ConcurrentHashMap[Long, String]()
  private def relidHash(table: String): Long = table.hashCode.toLong & 0xffffffffL
  def relidOf(table: String): Long = {
    val relid = relidHash(table)
    val prev = relidRegistry.putIfAbsent(relid, table)
    require(prev == null || prev == table,
      s"relid collision: tables '$prev' and '$table' both hash to $relid")
    relid
  }

  /** Driver-side upfront collision check over a FULL table set (the catalog
    * analog): returns the relid assignment, or fails deterministically before
    * any frame is encoded — closing the per-JVM gap of the executor-local
    * check above. O(tables) work, run once at pipeline start. Shares
    * [[relidHash]] with [[relidOf]] so the validated assignment is, by
    * construction, the one executors will use.
    */
  def validateRelids(tables: Seq[String]): Map[String, Long] = {
    val assigned = tables.distinct.map(t => t -> relidHash(t))
    for ((relid, group) <- assigned.groupBy(_._2) if group.size > 1)
      throw new IllegalArgumentException(
        s"relid collision: tables ${group.map(_._1).mkString("'", "', '", "'")} all hash to $relid")
    assigned.toMap
  }

  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** TableSchema wire payload. Like the reference — where the Avro record
    * schema's name/namespace carry the table identity, and the client learns
    * relid→table from the schema message itself (ext/oid2avro.c:122–182;
    * client/protocol_client.c:124–167) — the rowSchema string is a JSON
    * object {"name": <table>, "type": <schema-json-or-null>}.
    */
  private def schemaPayload(table: String, schemaJson: String): String = {
    val n = jsonMapper.createObjectNode()
    n.put("name", table)
    n.set[com.fasterxml.jackson.databind.JsonNode]("type",
      if (schemaJson == null) jsonMapper.nullNode() else jsonMapper.readTree(schemaJson))
    jsonMapper.writeValueAsString(n)
  }

  /** Encode one transaction's events as a framed byte array:
    * BeginTxn + messages + CommitTxn (ordering per ext/logdecoder.c).
    * `Op.Schema` events (as built by SchemaCache.schemaMessage: relid in
    * `key`, schema JSON in `after`) become TableSchema messages, prepended by
    * the caller before the first row of a (re)discovered relation exactly as
    * the reference does (ext/protocol_server.c:78–99).
    *
    * `relidFor` assigns relids to row events. The default hashes the table
    * name, which is wrong across DDL churn — a Postgres OID is stable when
    * the table is RENAMED — so a pipeline emitting renames must pass its own
    * stable assignment (the catalog analog).
    */
  def encodeTxn(xid: Long, lsn: Long, events: Seq[CdcEvent],
      relidFor: String => Long = relidOf): Array[Byte] = {
    val msgs = new java.util.ArrayList[AnyRef]()
    val begin = new GenericData.Record(branch("BeginTxn"))
    begin.put("xid", xid)
    msgs.add(begin)
    events.foreach { e =>
      val rec = e.op match {
        case Op.Insert =>
          val r = new GenericData.Record(branch("Insert"))
          r.put("relid", relidFor(e.table)); r.put("key", bb(e.key))
          r.put("newRow", bb(e.after)); r
        case Op.Update =>
          val r = new GenericData.Record(branch("Update"))
          r.put("relid", relidFor(e.table)); r.put("key", bb(e.key))
          r.put("oldRow", bb(e.before)); r.put("newRow", bb(e.after)); r
        case Op.Delete =>
          val r = new GenericData.Record(branch("Delete"))
          r.put("relid", relidFor(e.table)); r.put("key", bb(e.key))
          r.put("oldRow", bb(e.before)); r
        case Op.Schema =>
          val r = new GenericData.Record(branch("TableSchema"))
          r.put("relid", e.key.toLong)
          r.put("keySchema", null)
          r.put("rowSchema", schemaPayload(e.table, e.after)); r
        case other => throw new IllegalArgumentException(s"not a frame op: $other")
      }
      msgs.add(rec)
    }
    val commit = new GenericData.Record(branch("CommitTxn"))
    commit.put("xid", xid); commit.put("lsn", lsn)
    msgs.add(commit)

    val frame = new GenericData.Record(schema)
    frame.put("msg", msgs)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(frame, enc)
    enc.flush()
    out.toByteArray
  }

  /** Avro-JSON (union-tagged, e.g. {"key":{"bytes":"…"}}) encoding of a
    * transaction frame — ≙ the producer's --output-format=json path
    * (kafka/json.c:23–101), which emits Avro's JSON encoding rather than
    * plain JSON.
    */
  def encodeTxnJson(xid: Long, lsn: Long, events: Seq[CdcEvent]): String = {
    val binary = encodeTxn(xid, lsn, events)
    val dec = DecoderFactory.get().binaryDecoder(binary, null)
    val frame = new GenericDatumReader[GenericRecord](schema).read(null, dec)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().jsonEncoder(schema, out)
    new GenericDatumWriter[GenericRecord](schema).write(frame, enc)
    enc.flush()
    out.toString(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Decoder-side relid → (table, row-schema JSON) state — ≙ the client's
    * per-relid schema entry, REPLACED on every TableSchema message
    * (client/protocol_client.c:124–167; lookup :314–320). This is what
    * survives ALTER TABLE / rename mid-stream (the DDL-churn matrix of
    * spec/functional/topic_spec.rb:16–274): events decoded after a rename
    * resolve to the new name without restarting the stream.
    *
    * `fallback` resolves relids never announced by a TableSchema message
    * (e.g. a stream joined mid-flight with a statically-known table set).
    */
  final class DecoderSchemaState(
      fallback: Long => String = rid =>
        throw new NoSuchElementException(
          s"unknown relid $rid: no TableSchema message seen and no fallback")) {
    private val byRelid = scala.collection.mutable.Map[Long, (String, String)]()
    def update(relid: Long, table: String, schemaJson: String): Unit =
      byRelid(relid) = (table, schemaJson)
    def tableOf(relid: Long): String =
      byRelid.get(relid).map(_._1).getOrElse(fallback(relid))
    def schemaJsonOf(relid: Long): Option[String] =
      byRelid.get(relid).flatMap(e => Option(e._2))
    def snapshot: Map[Long, (String, String)] = byRelid.toMap
  }

  /** Decode a frame back into events; strict trailing-bytes check mirrors
    * parse_frame (client/protocol_client.c:397–412). Table names are not in
    * the wire format (only relids): row messages resolve through `state`,
    * which TableSchema messages update IN STREAM ORDER — so a relid renamed
    * mid-frame resolves to its old name before the rename and the new name
    * after, exactly like the reference client. Schema messages are also
    * surfaced as `Op.Schema` events (the on_table_schema callback analog).
    */
  def decodeFrame(bytes: Array[Byte], state: DecoderSchemaState): (Long, Long, Seq[CdcEvent]) = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    val frame = new GenericDatumReader[GenericRecord](schema).read(null, dec)
    require(dec.isEnd, "trailing bytes after frame")
    var xid = -1L
    var lsn = -1L
    val events = Seq.newBuilder[CdcEvent]
    var seq = 0L
    frame.get("msg").asInstanceOf[java.util.List[AnyRef]].asScala.foreach {
      case r: GenericRecord =>
        val relid = Option(r.getSchema.getField("relid")).map(_ => r.get("relid").asInstanceOf[Long])
        def table = state.tableOf(relid.get)
        r.getSchema.getName match {
          case "BeginTxn" => xid = r.get("xid").asInstanceOf[Long]
          case "CommitTxn" =>
            xid = r.get("xid").asInstanceOf[Long]
            lsn = r.get("lsn").asInstanceOf[Long]
          case "TableSchema" =>
            val raw = String.valueOf(r.get("rowSchema"))
            val payload = try jsonMapper.readTree(raw) catch {
              case e: Exception => throw new IllegalArgumentException(
                s"TableSchema rowSchema is not JSON (relid ${relid.get}): $raw", e)
            }
            val nameNode = payload.get("name")
            // fail loudly on foreign payload shapes (e.g. a bare Avro record
            // schema) rather than NPE or caching garbage — this codec's wire
            // convention is the {"name","type"} object schemaPayload writes
            require(nameNode != null && nameNode.isTextual,
              s"TableSchema rowSchema missing textual 'name' (relid ${relid.get}): $raw")
            val name = nameNode.asText()
            val tpe = payload.get("type")
            val schemaJson = if (tpe == null || tpe.isNull) null else tpe.toString
            state.update(relid.get, name, schemaJson)
            events += CdcEvent(Op.Schema, name, 0, xid, seq,
              relid.get.toString, null, schemaJson)
            seq += 1
          case "Insert" =>
            events += CdcEvent(Op.Insert, table, 0, xid, seq, str(r.get("key")),
              null, str(r.get("newRow"))); seq += 1
          case "Update" =>
            events += CdcEvent(Op.Update, table, 0, xid, seq, str(r.get("key")),
              str(r.get("oldRow")), str(r.get("newRow"))); seq += 1
          case "Delete" =>
            events += CdcEvent(Op.Delete, table, 0, xid, seq, str(r.get("key")),
              str(r.get("oldRow")), null); seq += 1
        }
    }
    // commit LSN stamps every event in the txn (events visible only at commit,
    // README.md:55–57)
    (xid, lsn, events.result().map(_.copy(lsn = lsn)))
  }

  /** Static-resolution decode for callers with a fixed, known table set (no
    * mid-stream DDL): a fresh schema state whose fallback is the given map.
    */
  def decodeFrame(bytes: Array[Byte], tableOf: Long => String): (Long, Long, Seq[CdcEvent]) =
    decodeFrame(bytes, new DecoderSchemaState(tableOf))
}
