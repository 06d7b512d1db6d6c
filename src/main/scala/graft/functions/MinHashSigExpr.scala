package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.operators.TextOps
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature: text → k-token shingles → md5 base hash per
  * shingle → 16 affine-permuted minimums, in a single native expression.
  *
  * Bit-identical to the composed TextOps pipeline (tokens → shingles →
  * baseHashes → minhashCols) — same tokenizer, same "0:" salt, same affine
  * family — but one pass over primitive arrays instead of four interpreted
  * higher-order-function projections. The composed version stays as the
  * declarative reference; this is the hot-path variant (PLANS.md candidate).
  */
object MinHashSig {
  def signature(text: UTF8String, k: Int, perms: Int): GenericArrayData = {
    val toks = text.toString.split(" ").filter(_.nonEmpty)
    val mins = Array.fill(perms)(Long.MaxValue)
    val md = MessageDigest.getInstance("MD5")
    val mod = TextOps.MinhashMod
    var i = 0
    val n = toks.length - k + 1
    val sb = new java.lang.StringBuilder
    while (i < n) {
      sb.setLength(0)
      sb.append("0:")
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % mod
      var p = 0
      while (p < perms) {
        val v = ((2L * p + 1) * h + (12345L * p + 678)) % mod
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    // docs shorter than k tokens have no shingles: empty mins → nulls would
    // differ from array_min(empty)=null; normalize to null sentinel per perm
    new GenericArrayData(mins.map(m =>
      if (m == Long.MaxValue) null else java.lang.Long.valueOf(m)))
  }
}

case class MinHashSigExpr(child: Expression, k: Int = 3,
    perms: Int = TextOps.NumPerms) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(v: Any): Any =
    MinHashSig.signature(v.asInstanceOf[UTF8String], k, perms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.signature($c, $k, $perms)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
  override def prettyName: String = "minhash_signature"
}
