package graft.functions

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column-level API + SQL registration for the engine's custom functions.
  * All are native Catalyst expressions with codegen — no Scala UDFs on hot
  * paths (SURVEY §4 custom-work list).
  */
object GraftFunctions {
  private def c(e: Expression): Column = GraftShims.column(e)
  private def e(col: Column): Expression = GraftShims.expression(col)

  def avro_safe_name(col: Column): Column = c(AvroSafeNameExpr(e(col)))

  def schema_id_frame(id: Column, payload: Column): Column =
    c(SchemaIdFrame(e(id), e(payload)))

  def schema_id_of(framed: Column): Column = c(SchemaIdOf(e(framed)))

  def strip_schema_frame(framed: Column): Column = c(StripSchemaFrame(e(framed)))

  def doc_fingerprint(text: Column): Column = c(DocFingerprintExpr(e(text)))

  def simhash(text: Column): Column = c(SimHashExpr(e(text)))

  def dot_q(a: Column, b: Column): Column = c(DotQExpr(e(a), e(b)))

  def l2_q(a: Column, b: Column): Column = c(L2QExpr(e(a), e(b)))

  def kafka_partition(key: Column, n: Column): Column =
    c(KafkaPartitionExpr(e(key), e(n)))

  def minhash_signature(text: Column, k: Int = 3): Column =
    c(MinHashSigExpr(e(text), k))

  /** Register all custom functions for SQL use (`SELECT avro_safe_name(x)`). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = GraftShims.sessionState(spark).functionRegistry
    reg.createOrReplaceTempFunction("avro_safe_name",
      es => AvroSafeNameExpr(es.head), "built-in")
    reg.createOrReplaceTempFunction("schema_id_frame",
      es => SchemaIdFrame(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("schema_id_of",
      es => SchemaIdOf(es.head), "built-in")
    reg.createOrReplaceTempFunction("strip_schema_frame",
      es => StripSchemaFrame(es.head), "built-in")
    reg.createOrReplaceTempFunction("doc_fingerprint",
      es => DocFingerprintExpr(es.head), "built-in")
    reg.createOrReplaceTempFunction("simhash",
      es => SimHashExpr(es.head), "built-in")
    reg.createOrReplaceTempFunction("kafka_partition",
      es => KafkaPartitionExpr(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSigExpr(es.head), "built-in")
  }
}
