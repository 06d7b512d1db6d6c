package graft.cdc

import org.apache.spark.sql.types.StructType

/** Schema-change detection + registry — ≙ the reference's three metadata
  * caches:
  *   - schema cache keyed by relation id, detecting shape changes and
  *     triggering TableSchema messages (ext/schema_cache.c:46–163)
  *   - producer-side table-metadata cache with idempotent update and
  *     failed-registration tombstoning (kafka/table_mapper.c:58–147)
  *   - Confluent registry client with id-identity short-circuit
  *     (kafka/registry.c:93–213; id reuse skip kafka/table_mapper.c:245–296)
  *
  * Driver-side state (SURVEY §1.2: Map[TableId, StructType] analog). At
  * cluster scale this is broadcast to executors per micro-batch; the state is
  * O(tables), not O(data).
  */
object SchemaCache {
  sealed trait LookupResult
  case object Unchanged extends LookupResult
  case object Changed extends LookupResult
  case object New extends LookupResult

  /** TableSchema control message for a (re)discovered relation — prepended to
    * the frame before the row event (ext/protocol_server.c:78–99). The relid
    * rides in the `key` field so consumers can build the relid→schema map
    * that row-message resolution needs (client/protocol_client.c:314–320).
    */
  def schemaMessage(relid: Long, tableName: String, schema: StructType): CdcEvent =
    CdcEvent(Op.Schema, tableName, 0, 0, 0, relid.toString, null, schema.json)
}

final class SchemaCache {
  import SchemaCache._
  private val cache = scala.collection.mutable.Map[Long, (String, StructType)]()

  /** Mirror of schema_cache_lookup's {0=unchanged, 1=changed, 2=new} contract
    * (ext/schema_cache.c:46–80): change = relation renamed OR column shape
    * differs (the equalTupleDescs analog is StructType equality).
    */
  def lookup(relid: Long, tableName: String, schema: StructType): LookupResult =
    cache.get(relid) match {
      case None =>
        cache(relid) = (tableName, schema); New
      case Some((n, s)) if n == tableName && s == schema => Unchanged
      case _ =>
        cache(relid) = (tableName, schema); Changed
    }

  /** Instance alias of [[SchemaCache.schemaMessage]] (kept for callers that
    * hold a cache and emit the message in one breath).
    */
  def schemaMessage(relid: Long, tableName: String, schema: StructType): CdcEvent =
    SchemaCache.schemaMessage(relid, tableName, schema)

  def snapshot: Map[Long, (String, StructType)] = cache.toMap
}

/** In-memory Confluent-style schema registry: subject `{topic}-key|-value`,
  * monotonically assigned ids, identical-schema id reuse. A stand-in for the
  * HTTP registry (zero-egress environment) with the same observable contract.
  */
final class MockSchemaRegistry {
  private val idBySchema = scala.collection.mutable.Map[String, Int]()
  private val subjectVersions = scala.collection.mutable.Map[String, Vector[Int]]()
  private var next = 1

  /** Availability switch for failure injection — the "schema registry is
    * down" scenarios of spec/functional/error_handling_spec.rb:37–52, 92–117.
    * While false, register throws (the HTTP-connection-refused analog).
    */
  @volatile var available: Boolean = true

  /** Register (or re-find) a schema under `{topic}-{key|value}`; returns the
    * id. Ids are GLOBAL per distinct schema (Confluent semantics): the same
    * schema registered under any subject yields the same id — the identity
    * the producer uses to skip re-parsing (kafka/table_mapper.c:277).
    */
  def register(topic: String, isKey: Boolean, schemaJson: String): Int = {
    if (!available)
      throw new IllegalStateException(s"schema registry unavailable (topic $topic)")
    val subject = topic + (if (isKey) "-key" else "-value")
    val id = idBySchema.getOrElseUpdate(schemaJson, { val i = next; next += 1; i })
    val versions = subjectVersions.getOrElse(subject, Vector.empty)
    if (!versions.contains(id)) subjectVersions(subject) = versions :+ id
    id
  }

  def subjects: Set[String] = subjectVersions.keySet.toSet
  def versions(subject: String): Vector[Int] =
    subjectVersions.getOrElse(subject, Vector.empty)
}
