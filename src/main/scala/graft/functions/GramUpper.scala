package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** `gram_upper(qv, dim)` — the exact upper-triangular integer Gram fold
  * (r18): Σ_v qv_i·qv_j for every 0-based pair i < j, accumulated into
  * ONE `dim·(dim−1)/2`-long buffer per partition and emitted as a single
  * `array<bigint>` in row-major (i, j) pair order.
  *
  * Exists for a measured reason: the previous declarative spelling
  * (explode a dim²/2-pair literal through a `transform` lambda, then a
  * pair-keyed shuffle fold) evaluates its higher-order function
  * INTERPRETED per element — dim 64 × 2000 rows = 4M struct allocations
  * through the lambda dispatch plus a 4M-row exchange, ~1.5 s of x189's
  * toy-scale wall and the dominant term at any corpus size. This
  * aggregate's update is the bare dim²/2 multiply-add loop over the
  * row's long array; the shuffle carries ONE buffer per partition.
  * Integer sums are order-free, so the per-pair totals are bit-identical
  * to the exploded fold's.
  */
case class GramUpperExpression(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dim >= 2, s"gram_upper needs dim >= 2, got $dim")
  private def pairs: Int = dim * (dim - 1) / 2

  override def createAggregationBuffer(): Array[Long] = new Array[Long](pairs)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val qv = v.asInstanceOf[ArrayData]
    require(qv.numElements() == dim,
      s"gram_upper: vector width ${qv.numElements()} does not match dim $dim")
    var t = 0
    var i = 0
    while (i < dim) {
      val qi = qv.getLong(i)
      var j = i + 1
      while (j < dim) {
        buf(t) += qi * qv.getLong(j)
        t += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var t = 0
    while (t < b1.length) { b1(t) += b2(t); t += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var t = 0
    while (t < buf.length) { bb.putLong(buf(t)); t += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var t = 0
    while (t < out.length) { out(t) = bb.getLong; t += 1 }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_upper"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_upper expects a bigint array, got ${other.sql}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramUpperExpression =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramUpperExpression =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramUpperExpression =
    copy(child = newChild)
}

object GramUpper {
  def gram_upper(qv: Column, dim: Int): Column =
    shim.column(GramUpperExpression(shim.expression(qv), dim).toAggregateExpression())
}
