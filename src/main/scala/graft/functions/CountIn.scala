package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `count_in(toks, words)` — how many ELEMENT INSTANCES of a string array
  * belong to a fixed word set (duplicates counted — this is the stopword
  * HIT count, not the distinct intersection [[IntersectSizeUtil]]
  * computes).
  *
  * Replaces `size(filter(toks, t => t.isin(words...)))` on the quality
  * hot path: the higher-order `filter` evaluates an interpreted
  * In-predicate lambda per token and materializes the kept tokens as an
  * array just to size it. Here the set is hashed ONCE per plan (a
  * codegen reference object), each token is one O(1) probe, and nothing
  * is materialized.
  */
object CountInUtil {
  def countIn(toks: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    var n = 0L
    var i = 0
    while (i < toks.numElements()) {
      // null elements never match (same as the isin-filter spelling)
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}

case class CountInExpression(child: Expression, words: Seq[String])
    extends UnaryExpression {

  // rebuilt after serialization to executors; shared by both eval paths
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    // null words can never match a token (the isin semantics) — skip them
    words.foreach(w => if (w != null) s.add(UTF8String.fromString(w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_in expects array<string>, got ${other.sql}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(toks: Any): Any =
    CountInUtil.countIn(toks.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = CountInUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val setRef = ctx.addReferenceObj("countInSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    defineCodeGen(ctx, ev, c => s"$m.countIn($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInExpression =
    copy(child = newChild)
}

object CountIn {
  /** Instance count of array elements within a fixed word set. */
  def countIn(toks: Column, words: Seq[String]): Column =
    shim.column(CountInExpression(shim.expression(toks), words))
}
