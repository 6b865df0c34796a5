package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `dup_gram_cov(tokens, k)` — the number of token POSITIONS covered by
  * some contiguous k-gram that occurs at least twice within the same
  * document (the Gopher/MassiveText "fraction of tokens inside
  * duplicated n-grams" repetition filter, Rae et al. 2021 §A1.1 — the
  * POSITIONAL metric [[NgramStatsExpression]]'s multiset ratios do not
  * capture: ten scattered repeats of one gram and one ten-fold repeat
  * of ten grams have the same top-gram fraction but very different
  * coverage).
  *
  * One compiled two-pass scan per row: hash-count the k-gram multiset,
  * then mark the k positions under every occurrence of a gram with
  * count ≥ 2 and count marked slots. Row-local — zero shuffle at any
  * corpus size; the declarative spelling would need a per-doc
  * gram-count join or an O(n²) interpreted filter. Exact integer
  * output, so the caller's `n_cov / n_tokens` stays the single IEEE
  * division the oracle contract wants.
  */
object DupGramCoverageUtil {
  private val space = UTF8String.fromString(" ")

  def cov(toks: ArrayData, k: Int): Long = {
    val n = toks.numElements()
    if (n < k) return 0L
    val grams = new Array[UTF8String](n - k + 1)
    val counts = new java.util.HashMap[UTF8String, Int]()
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
      grams(i) = gram
      counts.merge(gram, 1, (a, b) => a + b)
      i += 1
    }
    val covered = new Array[Boolean](n)
    i = 0
    while (i <= n - k) {
      if (counts.get(grams(i)) >= 2) {
        var j = 0
        while (j < k) { covered(i + j) = true; j += 1 }
      }
      i += 1
    }
    var c = 0L
    i = 0
    while (i < n) { if (covered(i)) c += 1; i += 1 }
    c
  }
}

case class DupGramCoverageExpression(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"ngram width k must be >= 1, got $k")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    DupGramCoverageUtil.cov(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = DupGramCoverageUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.cov($c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): DupGramCoverageExpression =
    copy(child = newChild)
}

object DupGramCoverage {
  /** Positions covered by within-document duplicated k-grams. */
  def dupGramCov(toks: Column, k: Int): Column =
    shim.column(DupGramCoverageExpression(shim.expression(toks), k))
}
