package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `ngram_stats(tokens, k)` — one pass over a document's token k-gram
  * MULTISET (contiguous, duplicates kept): returns
  * `struct(n_grams, n_distinct, max_count)`.
  *
  * Backs the repetition measurements of SURVEY.md §2b (EXT-C2/C3): the
  * distinct-gram ratio and the most-frequent-gram fraction. The
  * declarative spelling — `array_max(transform(array_distinct(bg),
  * g -> size(filter(bg, t -> t = g))))` — is O(n·distinct) interpreted
  * lambda dispatch per row (measured ~2.7 s over sf0.1's 5 000 docs);
  * this expression is one compiled hash-count pass (~10×). Counts are
  * exact integers, so the oracle contract is untouched — ratios stay
  * single IEEE divisions done by the caller.
  */
object NgramStatsUtil {
  private val space = UTF8String.fromString(" ")

  def stats(toks: ArrayData, k: Int): InternalRow = {
    val n = toks.numElements()
    if (n < k) return InternalRow(0L, 0L, 0L)
    val counts = new java.util.HashMap[UTF8String, Int]()
    var max = 0
    var i = 0
    while (i <= n - k) {
      val gram =
        if (k == 1) toks.getUTF8String(i)
        else {
          val parts = new Array[UTF8String](k)
          var j = 0
          while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
          UTF8String.concatWs(space, parts: _*)
        }
      val c = counts.merge(gram, 1, (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    InternalRow((n - k + 1).toLong, counts.size.toLong, max.toLong)
  }
}

case class NgramStatsExpression(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"ngram width k must be >= 1, got $k") // k=0 would count n+1 empty grams

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    NgramStatsUtil.stats(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = NgramStatsUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.stats($c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramStatsExpression =
    copy(child = newChild)
}

object NgramStats {
  /** struct(n_grams, n_distinct, max_count) over the token k-gram multiset. */
  def ngramStats(toks: Column, k: Int): Column =
    shim.column(NgramStatsExpression(shim.expression(toks), k))
}
