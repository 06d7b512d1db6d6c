package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: polynomial rolling hash over Unicode CODEPOINTS,
  * h ← (h·131 + cp) mod (2³¹−1). Implemented as a native expression (one
  * pass, codegen'd) rather than an exploded-array aggregation.
  *
  * Codepoints, not UTF-8 bytes: the DuckDB oracle restates the definition as
  * a fold over `unicode(char)` — a byte-level definition would silently
  * diverge on the first non-ASCII document. Mersenne-31 keeps the recurrence
  * exact in 64-bit arithmetic on both engines (cp ≤ 0x10FFFF < 2³¹).
  */
object DocFingerprint {
  val Base = 131L
  val Mod = 2147483647L // 2^31 - 1

  def fingerprint(s: UTF8String): Long = {
    var h = 0L
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) {
      h = (h * Base + it.nextInt()) % Mod
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

  /** null (not all-bits-set) for token-less documents: 32 zero votes would
    * yield 0xFFFFFFFF, making every empty doc "near" any positive-voting doc
    * — and the SQL-oracle restatement naturally aggregates to NULL there.
    */
  def simhash(s: UTF8String): java.lang.Long = {
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](32)
    val md = MessageDigest.getInstance("MD5")
    var any = false
    for (tok <- s.toString.split(" ") if tok.nonEmpty && seen.add(tok)) {
      any = true
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
    if (!any) return null
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
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SimHash.simhash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(c)
  override def prettyName: String = "simhash"
}
