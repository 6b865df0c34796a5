package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_ngrams(text, n)` — the DISTINCT character n-grams of a string in
  * first-occurrence order, one compiled pass per row.
  *
  * Semantics are exactly `array_distinct(transform(sequence(1,
  * length(text) − n + 1), i -> substring(text, i, n)))`: grams are n
  * CODE POINTS (matching Spark's `substring` and DuckDB's `substr`
  * character counting), so results agree for any Unicode text. Exists
  * because that declarative spelling evaluates interpreted lambdas per
  * character per row — the char-bigram language-ID measured 3.9 s at
  * sf0.1 against ~0.3 s with this expression.
  */
object CharNgramUtil {
  def distinctGrams(s: UTF8String, n: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    if (cps.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= cps.length - n) {
      seen.add(UTF8String.fromString(new String(cps, i, n)))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }
}

case class CharNgramsExpression(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"char n-gram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    CharNgramUtil.distinctGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = CharNgramUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.distinctGrams($c, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramsExpression =
    copy(child = newChild)
}

object CharNgrams {
  /** Distinct character n-grams of a string column (codegen'd). */
  def charNgrams(text: Column, n: Int): Column =
    shim.column(CharNgramsExpression(shim.expression(text), n))
}
