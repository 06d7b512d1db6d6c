package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Kafka-default-partitioner-compatible key→partition mapping — the
  * reference's partitioning guarantee (kafka/bottledwater.c:784–808,
  * README.md:384–398): consistent hash of the key bytes, so every change for
  * a key lands on the same partition (pinned by
  * spec/functional/partitioning_spec.rb:24–111).
  *
  * murmur2 below is the Kafka default partitioner's algorithm (public, from
  * the Kafka protocol docs): partition = (murmur2(keyBytes) & 0x7fffffff) % n.
  */
object KafkaPartitioner {
  /** Kafka's murmur2 (seed 0x9747b28c, m 0x5bd1e995). */
  def murmur2(data: Array[Byte]): Int = {
    val m = 0x5bd1e995
    val r = 24
    var h = 0x9747b28c ^ data.length
    val len4 = data.length / 4 * 4
    var i = 0
    while (i < len4) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 4
    }
    (data.length & 3: @annotation.switch) match {
      case 3 =>
        h ^= (data(len4 + 2) & 0xff) << 16
        h ^= (data(len4 + 1) & 0xff) << 8
        h ^= data(len4) & 0xff
        h *= m
      case 2 =>
        h ^= (data(len4 + 1) & 0xff) << 8
        h ^= data(len4) & 0xff
        h *= m
      case 1 =>
        h ^= data(len4) & 0xff
        h *= m
      case _ =>
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  def partitionFor(keyBytes: Array[Byte], numPartitions: Int): Int =
    (murmur2(keyBytes) & 0x7fffffff) % numPartitions
}

/** kafka_partition(key BINARY, n INT) → INT. */
case class KafkaPartitionExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(key: Any, n: Any): Any =
    KafkaPartitioner.partitionFor(key.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, n) =>
      s"graft.functions.KafkaPartitioner.partitionFor($k, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "kafka_partition"
}
