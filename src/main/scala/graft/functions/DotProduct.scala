package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, DoubleType, FloatType}

/** `dot_f(a, b)` — dot product of two float and/or double vectors,
  * accumulated in Double with a strict left-to-right fold:
  * `Σ_i (double)a[i] · (double)b[i]`. Mixed element types are legal per
  * side (a float corpus against double k-means centroids is the standard
  * ANN-serving shape); each float element widens exactly.
  *
  * Exists because the declarative spelling (`aggregate(zip_with(...))`)
  * evaluates its lambdas interpretively — per element, per row — which
  * dominates the similarity-search hot path (SURVEY.md §2b EXT-3). This
  * expression generates a primitive double loop inside whole-stage
  * codegen: no lambda dispatch, no boxing, no intermediate array.
  *
  * The fold order is part of the CONTRACT, not an implementation detail:
  * the DuckDB correctness oracle computes the identical IEEE-754 sum
  * (`list_reduce(list_prepend(0.0, list_transform(...)))`), so results
  * hash-match bit-for-bit. Do not reorder, vectorize pairwise, or fuse
  * into FMA.
  */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  // Analysis-time type check is load-bearing: getFloat over an
  // array<double> UnsafeArrayData would silently read half of each slot
  // and return garbage, not throw.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // containsNull=true must be ACCEPTED (Spark's parquet reader reports
    // it for all list columns); null ELEMENTS are rejected at runtime in
    // both eval paths instead — silently reading 0.0f from a nulled
    // UnsafeArrayData slot is the failure mode this expression exists to
    // avoid
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_f expects float/double arrays, got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  /** Per-side element width, resolved once from the child type (lazy:
    * children may be unresolved at construction).
    */
  private lazy val leftIsFloat: Boolean = isFloat(left)
  private lazy val rightIsFloat: Boolean = isFloat(right)
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // dimension mismatch must FAIL, not silently truncate to the shorter
    // vector — a partial dot product looks like a valid similarity
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"dot_f: dimension mismatch (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    val lf = leftIsFloat
    val rf = rightIsFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i))
        throw new IllegalArgumentException(s"dot_f: null element at index $i")
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val aGet = if (leftIsFloat) s"((double) $a.getFloat($i))" else s"$a.getDouble($i)"
      val bGet = if (rightIsFloat) s"((double) $b.getFloat($i))" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException("dot_f: dimension mismatch (" +
         |    $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw new IllegalArgumentException("dot_f: null element at index " + $i);
         |  }
         |  $acc += $aGet * $bGet;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpression =
    copy(left = newLeft, right = newRight)
}

/** `dot_l(a, b)` — dot product of two BIGINT vectors accumulated in
  * Long: `Σ_i a[i] · b[i]`, exact integer arithmetic (int8-quantized
  * codes at dim 64 peak at 127²·64 ≈ 2²⁰ — nowhere near overflow, and
  * integer addition is order-insensitive, so unlike [[DotProductExpression]]
  * no fold-order contract is needed for oracle agreement). Exists for
  * the same measured reason: the declarative
  * `aggregate(zip_with(...))` spelling evaluates interpreted lambdas
  * per element on the quantized-search hot path; this generates a
  * primitive long loop inside whole-stage codegen.
  *
  * Same load-bearing guards as the float variant: analysis-time element
  * type check (getLong over a mis-typed slot reads garbage, not an
  * error), runtime dimension-mismatch and null-element failures.
  */
case class LongDotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DataTypes.LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_l expects bigint arrays, got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DataTypes.LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"dot_l: dimension mismatch (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i))
        throw new IllegalArgumentException(s"dot_l: null element at index $i")
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException("dot_l: dimension mismatch (" +
         |    $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw new IllegalArgumentException("dot_l: null element at index " + $i);
         |  }
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProductExpression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Double-accumulated float-vector dot product (codegen'd). */
  def dot_f(a: Column, b: Column): Column =
    shim.column(DotProductExpression(shim.expression(a), shim.expression(b)))

  /** Exact long-vector dot product (codegen'd). */
  def dot_l(a: Column, b: Column): Column =
    shim.column(LongDotProductExpression(shim.expression(a), shim.expression(b)))
}
