package graft.cdc

import org.apache.spark.sql.types._

/** PostgreSQL → Spark type mapping — the complete table from SURVEY §1.3
  * (schema generation ext/oid2avro.c:265–362, value conversion :366–453).
  *
  * Differences from the reference, on purpose:
  *   - numeric/decimal maps to DecimalType, not double (the reference's
  *     acknowledged bug: FIXME at ext/oid2avro.c:455–457, "numeric replaced
  *     by zero" spec/functional/type_specs.rb:159–165).
  *   - int2 keeps ShortType instead of widening to int.
  * Everything the reference sends through the string fallback
  * (ext/oid2avro.c:317–349) is StringType here, with typed parse helpers
  * applied downstream (json → from_json, arrays → from_csv-style split).
  */
object PgTypes {
  /** Well-known PostgreSQL type OIDs (pg_type.h values, public catalog). */
  object Oid {
    val Bool = 16; val Bytea = 17; val Char = 18; val Name = 19
    val Int8 = 20; val Int2 = 21; val Int4 = 23; val RegProc = 24
    val Text = 25; val OidT = 26; val Xid = 28; val Cid = 29
    val Json = 114; val Xml = 142
    val Float4 = 700; val Float8 = 701; val Money = 790
    val BpChar = 1042; val VarChar = 1043
    val Date = 1082; val Time = 1083; val Timestamp = 1114
    val TimestampTz = 1184; val Interval = 1186; val TimeTz = 1266
    val Bit = 1560; val VarBit = 1562; val Numeric = 1700
    val Uuid = 2950; val Jsonb = 3802
  }
  import Oid._

  /** timetz: record{micro, zoneOffset} with the offset sign flipped to
    * ISO8601 (ext/oid2avro.c:584–585).
    */
  val timeTzType: StructType = StructType(Seq(
    StructField("micro", LongType, nullable = true),
    StructField("zoneOffset", IntegerType, nullable = true)))

  /** interval: calendar-aware decomposition (ext/oid2avro.c:703–737). */
  val intervalType: StructType = StructType(Seq(
    StructField("months", IntegerType, nullable = true),
    StructField("days", IntegerType, nullable = true),
    StructField("micros", LongType, nullable = true)))

  /** Spark type for a PG type OID; (precision, scale) honored for numeric. */
  def sparkType(oid: Int, precision: Int = 38, scale: Int = 18): DataType = oid match {
    case Bool => BooleanType
    case Float4 => FloatType
    case Float8 => DoubleType
    case Int2 => ShortType                   // reference widens to int; we keep int2
    case Int4 => IntegerType
    case Int8 | Money | OidT | RegProc | Xid | Cid => LongType
    case Numeric => DecimalType(precision, scale)  // reference: double (its known bug)
    case Date => DateType
    case Time => LongType                    // µs since midnight; Spark has no TimeType
    case TimeTz => timeTzType
    case Timestamp => TimestampNTZType
    case TimestampTz => TimestampType
    case Interval => intervalType
    case Bytea => BinaryType
    case _ => StringType                     // catch-all: OidOutputFunctionCall fallback
  }

  /** One pg_attribute row as schema generation sees it: a dropped column
    * stays in the tuple descriptor with attisdropped=true (and its slot still
    * occupies an attnum), so schema and row encoding must both skip it.
    */
  final case class PgAttribute(name: String, oid: Int, isDropped: Boolean = false)

  /** All columns nullable — every reference field is union{null, T}
    * (ext/oid2avro.c:350–362).
    */
  def schemaFor(cols: Seq[(String, Int)]): StructType =
    schemaForAttrs(cols.map { case (name, oid) => PgAttribute(name, oid) })

  /** Full tuple-descriptor analog of schema_for_table_row:
    *   - dropped columns are skipped, and the survivors keep their relative
    *     order — the field index is remapped past dropped slots exactly as
    *     tuple_to_avro_row advances `field` only for live columns
    *     (ext/oid2avro.c:167, 197);
    *   - a table with NO live columns (CREATE TABLE t (), or every column
    *     dropped) gets a single dummy boolean field (ext/oid2avro.c:153–163).
    *     Spark tolerates empty StructTypes, but the Avro wire contract does
    *     not — and a zero-column record would also break downstream `to_json`
    *     row encoding — so we keep the reference's shape.
    */
  def schemaForAttrs(cols: Seq[PgAttribute]): StructType = {
    val live = cols.filterNot(_.isDropped)
    if (live.isEmpty)
      StructType(Seq(StructField("dummy", BooleanType, nullable = true)))
    else
      StructType(live.map(a => StructField(a.name, sparkType(a.oid), nullable = true)))
  }

  /** Max encoded row size guard — the reference hard-fails rows whose frame
    * exceeds 1 MiB (ext/io_util.c:3–4; behavior pinned by
    * spec/functional/error_handling_spec.rb:54–73). Configurable here.
    */
  val MaxRecordBytes: Int = 1 << 20
}
