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
    */
  private val relidRegistry = new java.util.concurrent.ConcurrentHashMap[Long, String]()
  def relidOf(table: String): Long = {
    val relid = table.hashCode.toLong & 0xffffffffL
    val prev = relidRegistry.putIfAbsent(relid, table)
    require(prev == null || prev == table,
      s"relid collision: tables '$prev' and '$table' both hash to $relid")
    relid
  }

  /** Encode one transaction's events as a framed byte array:
    * BeginTxn + row messages + CommitTxn (ordering per ext/logdecoder.c).
    */
  def encodeTxn(xid: Long, lsn: Long, events: Seq[CdcEvent]): Array[Byte] = {
    val msgs = new java.util.ArrayList[AnyRef]()
    val begin = new GenericData.Record(branch("BeginTxn"))
    begin.put("xid", xid)
    msgs.add(begin)
    events.foreach { e =>
      val rec = e.op match {
        case Op.Insert =>
          val r = new GenericData.Record(branch("Insert"))
          r.put("relid", relidOf(e.table)); r.put("key", bb(e.key))
          r.put("newRow", bb(e.after)); r
        case Op.Update =>
          val r = new GenericData.Record(branch("Update"))
          r.put("relid", relidOf(e.table)); r.put("key", bb(e.key))
          r.put("oldRow", bb(e.before)); r.put("newRow", bb(e.after)); r
        case Op.Delete =>
          val r = new GenericData.Record(branch("Delete"))
          r.put("relid", relidOf(e.table)); r.put("key", bb(e.key))
          r.put("oldRow", bb(e.before)); r
        case other => throw new IllegalArgumentException(s"not a row op: $other")
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

  /** Decode a frame back into events; strict trailing-bytes check mirrors
    * parse_frame (client/protocol_client.c:397–412). Table names are not in
    * the wire format (only relids), so the caller resolves them — pass a
    * relid→table map (≙ the client's relid lookup, protocol_client.c:314–320).
    */
  def decodeFrame(bytes: Array[Byte], tableOf: Long => String): (Long, Long, Seq[CdcEvent]) = {
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
        def table = tableOf(relid.get)
        r.getSchema.getName match {
          case "BeginTxn" => xid = r.get("xid").asInstanceOf[Long]
          case "CommitTxn" =>
            xid = r.get("xid").asInstanceOf[Long]
            lsn = r.get("lsn").asInstanceOf[Long]
          case "TableSchema" => // schema cache update hook (SURVEY §2a #8)
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
}
