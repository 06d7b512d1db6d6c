package graft.cdc

import graft.functions.{AvroSafeName, GraftFunctions}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Topic routing — ≙ topic_name_from_avro_schema (kafka/bottledwater.c:386–415)
  * and prefix logic (kafka/table_mapper.c:199–229): one topic per table named
  * `[prefix].[pg_schema].[table]`, with the default `public` schema omitted
  * and identifiers sanitized to Avro-safe names.
  */
object TopicRouter {

  /** Column-level topic name from schema/table name columns (codegen-friendly:
    * pure built-in functions + the AvroSafeName expression).
    */
  def topicCol(prefix: String, schemaName: Column, tableName: Column): Column = {
    val safeSchema = GraftFunctions.avro_safe_name(schemaName)
    val safeTable = GraftFunctions.avro_safe_name(tableName)
    // isin, not ===: callers routinely pass lit("public") and a
    // literal==literal equals construction logs Spark's trivially-true
    // warning (same null semantics — single-element In ≡ EqualTo)
    val core = when(schemaName.isin("public") || schemaName.isNull, safeTable)
      .otherwise(concat(safeSchema, lit("."), safeTable))
    if (prefix == null || prefix.isEmpty) core else concat(lit(prefix + "."), core)
  }

  /** Scala-level twin for driver-side routing tables. */
  def topicName(prefix: String, schemaName: String, tableName: String): String = {
    val core =
      if (schemaName == null || schemaName == "public") AvroSafeName.sanitize(tableName)
      else AvroSafeName.sanitize(schemaName) + "." + AvroSafeName.sanitize(tableName)
    if (prefix == null || prefix.isEmpty) core else s"$prefix.$core"
  }
}
