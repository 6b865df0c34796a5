package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hash(text)` — the polynomial document fingerprint
  * `acc ← (acc·31 + codepoint) mod (2³¹−1)` over the text's code points,
  * one compiled pass per row.
  *
  * Identical to the declarative spelling (split into characters, `ascii`
  * each, left fold) and to the oracle's `list_reduce` — per-character
  * `ascii` is the code point, and the fold order is the string order.
  * Exists for plan cost: the higher-order fold evaluates interpreted
  * lambdas per character (measured 0.77 s at sf0.1; this: ~0.1 s).
  */
object RollingHashUtil {
  def hash(s: UTF8String): Long = {
    var acc = 0L
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) acc = (acc * 31 + it.nextInt()) % 2147483647L
    acc
  }
}

case class RollingHashExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    RollingHashUtil.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = RollingHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.hash($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpression =
    copy(child = newChild)
}

object RollingHash {
  /** Polynomial rolling-hash fingerprint of a string column (codegen'd). */
  def rollingHash(text: Column): Column =
    shim.column(RollingHashExpression(shim.expression(text)))
}
