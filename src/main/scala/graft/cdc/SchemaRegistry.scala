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

/** Schema-EVOLUTION compatibility — the Avro-resolution rules a Confluent
  * registry enforces per subject (BACKWARD / FORWARD / FULL), restated over
  * the StructType schemas [[PgTypes]] generates. `backwardReasons(reader,
  * writer)` answers "can a consumer on `reader` decode data written with
  * `writer`":
  *
  *   - field in both: types must match or be Avro-promotable
  *     (int→long/double, long→double, float→double);
  *   - field only in the writer: the reader ignores it — fine;
  *   - field only in the reader: needs a default — our all-nullable
  *     convention (PgTypes makes every column nullable, the reference's
  *     oid2avro.c nullable-union choice) supplies `null`, so nullable
  *     additions pass and non-nullable ones are the one structural break.
  *
  * Consequence worth stating: PG-derived schemas are FULL-compatible under
  * every add/drop-column DDL, and only TYPE changes (e.g. bigint→int) break
  * a direction — exactly the operational contract CDC pipelines advertise.
  */
object SchemaCompat {
  sealed trait Mode
  /** New schema can read data written with the previous one. */
  case object Backward extends Mode
  /** Previous schema can read data written with the new one. */
  case object Forward extends Mode
  /** Both directions. */
  case object Full extends Mode

  import org.apache.spark.sql.types._

  private def promotable(from: DataType, to: DataType): Boolean = (from, to) match {
    case (IntegerType, LongType | DoubleType) => true
    case (LongType, DoubleType) => true
    case (FloatType, DoubleType) => true
    case _ => false
  }

  /** Empty = compatible; otherwise one reason per offending field. */
  def backwardReasons(reader: StructType, writer: StructType): Seq[String] = {
    val wf = writer.fields.map(f => f.name -> f).toMap
    reader.fields.toSeq.flatMap { rf =>
      wf.get(rf.name) match {
        case Some(w) if w.dataType == rf.dataType ||
          promotable(w.dataType, rf.dataType) => Nil
        case Some(w) => Seq(s"field ${rf.name}: writer ${w.dataType.simpleString} " +
          s"not readable as ${rf.dataType.simpleString}")
        case None if rf.nullable => Nil // null default fills it
        case None => Seq(s"field ${rf.name}: added without default (non-nullable)")
      }
    }
  }

  /** Confluent-orientation check of `proposed` against the subject's
    * `latest`: BACKWARD reads old data with the new schema, FORWARD reads
    * new data with the old one, FULL both.
    */
  def check(mode: Mode, proposed: StructType, latest: StructType): Seq[String] =
    mode match {
      case Backward => backwardReasons(proposed, latest)
      case Forward  => backwardReasons(latest, proposed)
      case Full     => (backwardReasons(proposed, latest) ++
        backwardReasons(latest, proposed)).distinct
    }
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

  private val structById = scala.collection.mutable.Map[Int, StructType]()

  /** Compatibility-gated registration (the registry's `compatibility=<mode>`
    * subject config): the proposed schema is checked against the subject's
    * LATEST version under `mode`; an incompatible evolution is REFUSED with
    * the per-field reasons (Left) and registers nothing — the pipeline
    * fails at schema-publish time, not as undecodable frames downstream.
    * First registration under a subject always passes.
    */
  def registerChecked(topic: String, isKey: Boolean, schema: StructType,
      mode: SchemaCompat.Mode): Either[Seq[String], Int] = {
    val subject = topic + (if (isKey) "-key" else "-value")
    val latest = subjectVersions.getOrElse(subject, Vector.empty)
      .lastOption.flatMap(structById.get)
    val reasons = latest.map(SchemaCompat.check(mode, schema, _))
      .getOrElse(Nil)
    if (reasons.nonEmpty) Left(reasons)
    else {
      val id = register(topic, isKey, schema.json)
      structById(id) = schema
      Right(id)
    }
  }
}
