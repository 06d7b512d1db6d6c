package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Confluent Schema Registry wire framing — ≙ kafka/registry.c:63–87 and
  * registry.h:9: every Kafka message is `\0` (magic) + 4-byte big-endian
  * schema id + Avro binary payload.
  *
  * Native expressions (with codegen) so framing/unframing runs inside
  * whole-stage codegen on the produce/consume hot path.
  */
object RegistryFrame {
  val MagicByte: Byte = 0x00
  val PrefixLen = 5

  def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] = {
    if (payload == null) return null
    val out = new Array[Byte](PrefixLen + payload.length)
    out(0) = MagicByte
    out(1) = ((schemaId >> 24) & 0xff).toByte
    out(2) = ((schemaId >> 16) & 0xff).toByte
    out(3) = ((schemaId >> 8) & 0xff).toByte
    out(4) = (schemaId & 0xff).toByte
    System.arraycopy(payload, 0, out, PrefixLen, payload.length)
    out
  }

  /** Schema id from a framed message; fails fast on a bad magic byte
    * (strictness mirrors parse_frame's trailing-bytes check,
    * client/protocol_client.c:397–412).
    */
  def schemaId(framed: Array[Byte]): Int = {
    require(framed.length >= PrefixLen && framed(0) == MagicByte,
      s"not a registry-framed message (len=${framed.length})")
    ((framed(1) & 0xff) << 24) | ((framed(2) & 0xff) << 16) |
      ((framed(3) & 0xff) << 8) | (framed(4) & 0xff)
  }

  def strip(framed: Array[Byte]): Array[Byte] = {
    require(framed.length >= PrefixLen && framed(0) == MagicByte,
      s"not a registry-framed message (len=${framed.length})")
    java.util.Arrays.copyOfRange(framed, PrefixLen, framed.length)
  }
}

/** frame(schema_id INT, payload BINARY) → BINARY; null payload (tombstone)
  * stays null.
  */
case class SchemaIdFrame(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any, payload: Any): Any =
    RegistryFrame.frame(id.asInstanceOf[Int], payload.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, p) => s"graft.functions.RegistryFrame.frame($id, $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "schema_id_frame"
}

case class SchemaIdOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    RegistryFrame.schemaId(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RegistryFrame.schemaId($c)")
  override protected def withNewChildInternal(c: Expression): SchemaIdOf = copy(c)
  override def prettyName: String = "schema_id_of"
}

case class StripSchemaFrame(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    RegistryFrame.strip(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RegistryFrame.strip($c)")
  override protected def withNewChildInternal(c: Expression): StripSchemaFrame = copy(c)
  override def prettyName: String = "strip_schema_frame"
}
