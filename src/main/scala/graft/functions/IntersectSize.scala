package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `intersect_size(a, b)` — the number of DISTINCT common elements of two
  * string arrays, without materializing the intersection.
  *
  * Same value as `size(array_intersect(a, b))` (distinct semantics
  * included), but one hash-membership pass returning a count — the
  * built-in allocates the intersection as an array first. This is the
  * per-candidate verification kernel of the near-dup joins (SURVEY.md
  * §2b EXT-D2/D3), executed once per surviving candidate pair.
  */
object IntersectSizeUtil {
  def intersectSize(a: ArrayData, b: ArrayData): Long = {
    // build the set from the smaller side; probe with the larger
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) { set.add(small.getUTF8String(i)); i += 1 }
    var n = 0L
    var j = 0
    while (j < large.numElements()) {
      // remove-on-hit = distinct counting even with duplicate probes
      if (set.remove(large.getUTF8String(j))) n += 1
      j += 1
    }
    n
  }
}

case class IntersectSizeExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_size expects (array<string>, array<string>), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectSizeUtil.intersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = IntersectSizeUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$m.intersectSize($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSizeExpression =
    copy(left = newLeft, right = newRight)
}

object IntersectSize {
  /** Distinct-intersection cardinality of two string-array columns. */
  def intersectSize(a: Column, b: Column): Column =
    shim.column(IntersectSizeExpression(shim.expression(a), shim.expression(b)))
}
