package graft.cdc

import graft.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic CDC changelog derived from the `events` table — our
  * stand-in for the PostgreSQL logical-decoding plugin (we cannot run inside
  * Postgres; the reference's extension turns WAL into typed change events,
  * ext/logdecoder.c:126–180, and this generator plays that role for tests,
  * queries and benchmarks).
  *
  * Mapping (fixed, SQL-mirrorable for the DuckDB oracle):
  *   - table  = "public.users"; key = user_id
  *   - op     : signup → insert, error → delete (tombstone), else → update
  *   - lsn    = event_id  (event_ids are assigned in commit order)
  *   - xid    = event_id div 10  (10-event transactions)
  *   - after  = JSON {user_id, event_type, value}; null for deletes
  *              (delete ⇒ null value, kafka/bottledwater.c:533–541)
  */
object ChangelogGen {
  val TableName = "public.users"

  def opFor(eventType: String): String = eventType match {
    case "signup" => Op.Insert
    case "error"  => Op.Delete
    case _        => Op.Update
  }

  /** SQL CASE expression equivalent of [[opFor]] — used by oracle queries. */
  val opSql: String =
    "CASE event_type WHEN 'signup' THEN 'insert' WHEN 'error' THEN 'delete' ELSE 'update' END"

  def fromEvents(spark: SparkSession, dir: String): Dataset[CdcEvent] =
    projectEvents(Tables.events(spark, dir))

  /** The events→changelog projection behind [[fromEvents]], usable on ANY
    * events relation — including a STREAMING one (file stream), where the
    * same derivation feeds the stateful operators and the oracle restates
    * it with [[opSql]].
    */
  def projectEvents(events: org.apache.spark.sql.DataFrame): Dataset[CdcEvent] = {
    import events.sparkSession.implicits._
    // pipeline-start relid validation (trivially collision-free for one
    // table, but keeps the invariant wired at every changelog entry point)
    AvroFrame.validateRelids(Seq(TableName))
    events
      .select(
        when(col("event_type") === "signup", Op.Insert)
          .when(col("event_type") === "error", Op.Delete)
          .otherwise(Op.Update).as("op"),
        lit(TableName).as("table"),
        col("event_id").as("lsn"),
        expr("event_id div 10").as("xid"),
        lit(0L).as("seq"),
        col("user_id").cast("string").as("key"),
        lit(null).cast("string").as("before"),
        when(col("event_type") === "error", lit(null).cast("string"))
          .otherwise(to_json(struct(col("user_id"), col("event_type"), col("value"))))
          .as("after"))
      .as[CdcEvent]
  }
}
