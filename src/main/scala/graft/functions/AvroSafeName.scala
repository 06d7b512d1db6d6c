package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Avro-safe identifier sanitization — ≙ ext/oid2avro.c:799–828.
  *
  * Avro names must match [A-Za-z_][A-Za-z0-9_]*; every other BYTE of the
  * UTF-8 identifier is hex-escaped as `_xx_` ("person/name" → "person_2f_name",
  * "crêpes" → "cr_c3__aa_pes", spec/functional/schema_spec.rb:383–400).
  * A leading digit is escaped too.
  *
  * Implemented as a native Catalyst expression with codegen (not a Scala UDF)
  * so it stays inside whole-stage codegen on the hot routing path.
  */
object AvroSafeName {
  private def allowed(b: Byte, first: Boolean): Boolean = {
    val c = (b & 0xff).toChar
    c == '_' || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (!first && c >= '0' && c <= '9')
  }

  def sanitize(name: String): String = {
    if (name == null) return null
    val bytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (allowed(b, i == 0)) sb.append((b & 0xff).toChar)
      else sb.append(f"_${b & 0xff}%02x_")
      i += 1
    }
    sb.toString
  }

  /** Postgres identifier length for reference parity (NAMEDATALEN − 1). */
  val PgMaxIdentifierBytes = 63

  /** Postgres NAMEDATALEN identifier truncation — the SOURCE-side contract
    * the reference's spec matrix relies on (spec/functional/schema_spec.rb:
    * 359–377, topic_spec.rb:72–80; spec_helper.rb:28 fixes the limit at 63):
    * Postgres silently clips identifiers to 63 BYTES, never splitting a
    * multibyte UTF-8 character (pg_encoding_mbcliplen), so the reference —
    * and this library — only ever see names at or under the limit. Names
    * within the limit pass through unchanged; apply this where identifiers
    * ENTER the pipeline from a non-Postgres source (e.g. snapshot table-name
    * arguments) to keep that invariant.
    */
  def pgTruncateIdentifier(name: String,
      maxBytes: Int = PgMaxIdentifierBytes): String = {
    if (name == null) return null
    val bytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.length <= maxBytes) name
    else {
      // back off past any continuation bytes (10xxxxxx) so a character
      // straddling the limit is dropped whole, exactly as PG clips it
      var end = maxBytes
      while (end > 0 && (bytes(end) & 0xc0) == 0x80) end -= 1
      new String(bytes, 0, end, java.nio.charset.StandardCharsets.UTF_8)
    }
  }
}

case class AvroSafeNameExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(AvroSafeName.sanitize(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.AvroSafeName.sanitize($c.toString()))")
  override protected def withNewChildInternal(c: Expression): AvroSafeNameExpr = copy(c)
  override def prettyName: String = "avro_safe_name"
}
