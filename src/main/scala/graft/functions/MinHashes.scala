package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhashes(shingles, numHashes)` — all `numHashes` seeded min-hashes of
  * a document's shingle set in one compiled row-local pass:
  * `mh[seed] = min over shingles of top60bits(md5(seed + ":" + shingle))`.
  *
  * Bit-identical to the per-(doc, seed) aggregation the oracle runs
  * (`min(('0x' || substr(md5(seed || ':' || shingle), 1, 15))::UBIGINT)`):
  * the top 15 hex chars of an md5 are its first eight bytes, big-endian,
  * shifted right one nibble — non-negative in a signed 64-bit long.
  *
  * Exists for plan shape, not hash speed: the declarative spelling
  * explodes numHashes rows per (doc, shingle) — 16× the shingle stream —
  * and pays two keyed shuffles (min per (doc, seed), then band pivot per
  * doc) before bucketing even starts. This turns the whole signature
  * computation into a narrow projection; only the band bucket join
  * shuffles. The md5 count is unchanged; empty shingle arrays must be
  * filtered upstream (the oracle's explode drops those docs).
  */
object MinHashUtil {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  // "<seed>:" prefixes, precomputed for the practical seed range
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(64)(s => s"$s:".getBytes("UTF-8"))

  def minhashes(shs: ArrayData, numHashes: Int): ArrayData = {
    val md = digests.get()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = shs.numElements()
    var i = 0
    while (i < n) {
      val bytes = shs.getUTF8String(i).getBytes
      var seed = 0
      while (seed < numHashes) {
        md.reset()
        md.update(prefixes(seed))
        md.update(bytes)
        val d = md.digest()
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
        val h = v >>> 4
        if (h < mins(seed)) mins(seed) = h
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashesExpression(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 64, "numHashes must be in 1..64")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashUtil.minhashes(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = MinHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.minhashes($c, $numHashes)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashesExpression =
    copy(child = newChild)
}

object MinHashes {
  /** array<long> of the numHashes seeded min-hashes of a shingle array. */
  def minhashes(shs: Column, numHashes: Int): Column =
    shim.column(MinHashesExpression(shim.expression(shs), numHashes))
}
