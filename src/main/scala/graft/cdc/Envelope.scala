package graft.cdc

/** CDC change-event envelope — the engine's analog of the reference's frame
  * messages (union discriminants 0–5, ext/protocol.h:19–24, ext/protocol.c:16–57).
  *
  * The reference streams Avro-encoded messages
  * {BeginTxn, CommitTxn, TableSchema, Insert, Update, Delete}; rows ride as
  * Avro binary. Spark-first re-expression: ONE flat nullable-column envelope
  * row per message, so a whole CDC stream is a single `Dataset[CdcEvent]` /
  * DataFrame that Catalyst can filter/route/compact declaratively. Payloads
  * are JSON strings in the generic (dynamic-schema) path — per-table typed
  * decode happens downstream with `from_json` once a schema is known
  * (schema-on-read, SURVEY §1.2).
  *
  * Ordering: `lsn` totally orders commits (commit LSN, ext/logdecoder.c:109–124);
  * `seq` orders events within a transaction. (lsn, seq) is the event-time key
  * used by latest-state compaction.
  */
final case class CdcEvent(
    op: String,          // one of Op.*
    table: String,       // "schema.table" — routing key (kafka/bottledwater.c:386–415)
    lsn: Long,           // commit LSN of the containing txn (0 during snapshot)
    xid: Long,           // transaction id; 0 = consistent snapshot (client/connect.c:356–362)
    seq: Long,           // position within the txn's frame
    key: String,         // JSON of key columns; null ⇔ unkeyed table
    before: String,      // JSON of old row (update/delete with REPLICA IDENTITY FULL)
    after: String)       // JSON of new row; null ⇔ tombstone (kafka/bottledwater.c:533–541)

object Op {
  val Begin  = "begin"   // BeginTxn(xid)
  val Commit = "commit"  // CommitTxn(xid, lsn)
  val Schema = "schema"  // TableSchema(relid, keySchema, rowSchema)
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  /** Row-level ops that carry data (vs. txn/schema control messages). */
  val rowOps: Set[String] = Set(Insert, Update, Delete)
}
