package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: polynomial rolling hash over UTF-8 bytes,
  * h ← (h·131 + byte) mod (2³¹−1). Implemented as a native expression (one
  * pass over the bytes, codegen'd) rather than an exploded-array aggregation.
  *
  * The modulus is Mersenne-31 so the recurrence stays exact in 64-bit
  * arithmetic — which also makes the definition restatable in the DuckDB
  * oracle via list_reduce without overflow.
  */
object DocFingerprint {
  val Base = 131L
  val Mod = 2147483647L // 2^31 - 1

  def fingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }
}

case class DocFingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    DocFingerprint.fingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DocFingerprint.fingerprint($c)")
  override protected def withNewChildInternal(c: Expression): DocFingerprintExpr = copy(c)
  override def prettyName: String = "doc_fingerprint"
}

/** 32-bit SimHash over distinct whitespace tokens: token hash = first 32 bits
  * of md5("7:" + token) (the same portable hash family as TextOps.hex32 with
  * salt 7); bit j of the result is set iff Σ_tokens (±1 on token-hash bit j)
  * is ≥ 0. Near-duplicate documents land within small Hamming distance.
  *
  * One native expression = one pass per document (tokenize, hash, 32-counter
  * vote) instead of a 32-way exploded aggregation.
  */
object SimHash {
  val Salt = 7

  def simhash(s: UTF8String): Long = {
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](32)
    val md = MessageDigest.getInstance("MD5")
    for (tok <- s.toString.split(" ") if tok.nonEmpty && seen.add(tok)) {
      md.reset()
      val d = md.digest((Salt + ":" + tok).getBytes(StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < 32) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHash.simhash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(c)
  override def prettyName: String = "simhash"
}
