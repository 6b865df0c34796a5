package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{DataType, LongType}

/** `simhash(tokens, bits)` — the document's SimHash fingerprint in one
  * compiled row-local pass: each token instance contributes ±1 to each of
  * `bits` counters according to the bit pattern of its hash (the top
  * `bits` bits of md5, the same truncation the oracle's
  * `('0x' || substr(md5(tok), 1, 15))::UBIGINT` computes); counters > 0
  * set their fingerprint bit.
  *
  * Per-instance ±1 equals the oracle's per-distinct-token ±weight — the
  * bit sums are linear — and integer sums are order-insensitive, so the
  * result is bit-identical however the work is arranged. Exists for plan
  * shape: the declarative spelling needed a token explode plus a
  * 60-conditional-sum aggregation (one keyed shuffle of the full token
  * stream); this makes the fingerprint a narrow projection, so near-dup
  * banding starts from a relation the size of the corpus' doc count.
  */
object SimHashUtil {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def simhash(toks: ArrayData, bits: Int): Long = {
    val md = digests.get()
    val sums = new Array[Int](bits)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(toks.getUTF8String(i).getBytes)
      val d = md.digest()
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      val h = v >>> (64 - bits)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (sums(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }
}

case class SimHashExpression(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 60, "bits must be in 1..60 (sign-safe BIGINT)")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = SimHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.simhash($c, $bits)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpression =
    copy(child = newChild)
}

object SimHash {
  /** The bits-wide SimHash fingerprint of a token array (codegen'd). */
  def simhash(toks: Column, bits: Int = 60): Column =
    shim.column(SimHashExpression(shim.expression(toks), bits))
}
