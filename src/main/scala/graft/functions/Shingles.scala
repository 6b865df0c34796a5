package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingles(tokens, k)` — distinct k-token shingles (space-joined), in
  * first-occurrence order; the unit of near-dup comparison (SURVEY.md §2b
  * EXT-2).
  *
  * Exists because the declarative spelling —
  * `array_distinct(transform(sequence(...), i => concat_ws(...)))` —
  * evaluates its lambda interpretively per element, and the optimizer
  * freely inlines the tokenizing `split` into every `element_at` when the
  * expression crosses a `Generate`, re-tokenizing each document ~150×
  * (measured: ~12 s to shingle 5 000 docs; this expression: ~0.1 s).
  * Single compiled pass per row, inside whole-stage codegen.
  *
  * Result order is never observable downstream (consumers are explode →
  * groupBy, sort_array, array_intersect, size), but first-occurrence
  * order keeps this a drop-in for the `array_distinct(transform(...))`
  * spelling.
  */
object ShingleUtil {
  def shingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val space = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }
}

case class ShinglesExpression(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle width k must be >= 1, got $k") // k=0 would emit a phantom "" shingle

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ShingleUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.shingles($c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpression =
    copy(child = newChild)
}

object Shingles {
  /** Distinct k-token shingles of a string array (codegen'd). */
  def shingles(toks: Column, k: Int): Column =
    shim.column(ShinglesExpression(shim.expression(toks), k))
}
