package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Codegen'd product-quantization kernels (SURVEY.md §2b EXT-S20/S31).
  *
  * Both exist for the same measured reason as [[DotProduct]]: the
  * declarative spellings are either KSUB-INLINED expression trees
  * (m·ksub dot expressions in one projection — the generated method
  * blows past Janino limits at the production geometry m 16 × ksub 128)
  * or `transform`/`zip_with`/`aggregate` LOOPS — which Spark always
  * evaluates INTERPRETED, per lambda, per element (higher-order
  * functions have no doGenCode), measured as the single-task wall that
  * kept the 60k-vector slice encode from finishing. These expressions
  * generate one primitive triple loop inside whole-stage codegen: no
  * lambda dispatch, no boxing, no intermediate arrays.
  *
  * Exactness contract: all arithmetic is exact BIGINT on the int8
  * lattice. The squared subvector distance is computed directly as
  * `Σ_d (q_d − c_d)²`, which over integers is IDENTICAL (not just
  * close) to the `‖q‖² − 2q·c + ‖c‖²` expansion the previous spellings
  * and the DuckDB oracles use — integer add/mul is associative and
  * exact, so codes, distances, and recon_err are bit-unchanged.
  */
object PqOps {

  /** The flattened codebook rides the expression as ONE reference
    * object (`long[(s·ksub + c)·dsub + d]`) instead of m·ksub literal
    * arrays — constant codegen size in every geometry knob.
    */
  private[functions] def flatten(cb: Array[Array[Array[Long]]]): Array[Long] = {
    val m = cb.length
    val ksub = cb.headOption.map(_.length).getOrElse(0)
    val dsub = cb.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)
    val out = new Array[Long](m * ksub * dsub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(cb(s)(c), 0, out, (s * ksub + c) * dsub, dsub)
        c += 1
      }
      s += 1
    }
    out
  }

  /** `pq_encode(qv)` — the PQ assignment kernel: per subspace the
    * argmin-distance code (ties to the LOWEST code id — the array_min
    * struct contract of the previous spelling) and the summed minimal
    * squared distance. Returns `struct(codes array<int>, recon_err
    * bigint)`.
    */
  def pq_encode(qv: Column, cb: Array[Array[Array[Long]]]): Column =
    shim.column(PqEncodeExpression(shim.expression(qv), flatten(cb),
      cb.length, cb.head.length, cb.head.head.length))

  /** `adc_table(qe)` — the per-query ADC distance table (Jégou et al.,
    * PAMI 2011): `dtab[s][c] = ‖q_s − cb[s][c]‖²` as m·ksub exact
    * BIGINTs, computed once per query row so every scored candidate
    * afterwards costs m array lookups.
    */
  def adc_table(qe: Column, cb: Array[Array[Array[Long]]]): Column =
    shim.column(AdcTableExpression(shim.expression(qe), flatten(cb),
      cb.length, cb.head.length, cb.head.head.length))
}

/** See [[PqOps.pq_encode]]. */
case class PqEncodeExpression(
    child: Expression, cbFlat: Array[Long], m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects a bigint array, got ${other.sql}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("recon_err", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    if (q.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector width ${q.numElements()} does not match m*dsub = ${m * dsub}")
    // r18 (ADVICE): a null element would read as garbage through
    // getLong — refuse loudly, the width-mismatch style. One O(dim)
    // pre-pass, negligible against the m·ksub·dsub main loop.
    var i = 0
    while (i < m * dsub) {
      if (q.isNullAt(i))
        throw new IllegalArgumentException(s"pq_encode: null element at index $i")
      i += 1
    }
    val codes = new Array[Int](m)
    var err = 0L
    var s = 0
    while (s < m) {
      var best = Long.MaxValue
      var bestC = 0
      val qoff = s * dsub
      var c = 0
      while (c < ksub) {
        var d2 = 0L
        val off = (s * ksub + c) * dsub
        var d = 0
        while (d < dsub) {
          val diff = q.getLong(qoff + d) - cbFlat(off + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < best) { best = d2; bestC = c }
        c += 1
      }
      codes(s) = bestC
      err += best
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(codes), err))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cbFlat, "long[]")
    nullSafeCodeGen(ctx, ev, q => {
      val codes = ctx.freshName("codes")
      val err = ctx.freshName("err")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val d2 = ctx.freshName("d2")
      val off = ctx.freshName("off")
      val diff = ctx.freshName("diff")
      s"""
         |if ($q.numElements() != ${m * dsub}) {
         |  throw new IllegalArgumentException("pq_encode: vector width " +
         |    $q.numElements() + " does not match m*dsub = ${m * dsub}");
         |}
         |for (int $d = 0; $d < ${m * dsub}; $d++) {
         |  if ($q.isNullAt($d)) {
         |    throw new IllegalArgumentException("pq_encode: null element at index " + $d);
         |  }
         |}
         |int[] $codes = new int[$m];
         |long $err = 0L;
         |for (int $s = 0; $s < $m; $s++) {
         |  long $best = Long.MAX_VALUE;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    long $d2 = 0L;
         |    int $off = ($s * $ksub + $c) * $dsub;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      long $diff = $q.getLong($s * $dsub + $d) - $cbRef[$off + $d];
         |      $d2 += $diff * $diff;
         |    }
         |    if ($d2 < $best) { $best = $d2; $bestC = $c; }
         |  }
         |  $codes[$s] = $bestC;
         |  $err += $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes),
         |    java.lang.Long.valueOf($err)});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpression =
    copy(child = newChild)
}

/** See [[PqOps.adc_table]]. */
case class AdcTableExpression(
    child: Expression, cbFlat: Array[Long], m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"adc_table expects a bigint array, got ${other.sql}")
    }

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    if (q.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"adc_table: query width ${q.numElements()} does not match m*dsub = ${m * dsub}")
    // r18 (ADVICE): refuse null elements loudly — see PqEncodeExpression
    var i = 0
    while (i < m * dsub) {
      if (q.isNullAt(i))
        throw new IllegalArgumentException(s"adc_table: null element at index $i")
      i += 1
    }
    val subs = new Array[Any](m)
    var s = 0
    while (s < m) {
      val row = new Array[Long](ksub)
      val qoff = s * dsub
      var c = 0
      while (c < ksub) {
        var d2 = 0L
        val off = (s * ksub + c) * dsub
        var d = 0
        while (d < dsub) {
          val diff = q.getLong(qoff + d) - cbFlat(off + d)
          d2 += diff * diff
          d += 1
        }
        row(c) = d2
        c += 1
      }
      subs(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(subs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("adcCb", cbFlat, "long[]")
    nullSafeCodeGen(ctx, ev, q => {
      val subs = ctx.freshName("subs")
      val row = ctx.freshName("row")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val d2 = ctx.freshName("d2")
      val off = ctx.freshName("off")
      val diff = ctx.freshName("diff")
      s"""
         |if ($q.numElements() != ${m * dsub}) {
         |  throw new IllegalArgumentException("adc_table: query width " +
         |    $q.numElements() + " does not match m*dsub = ${m * dsub}");
         |}
         |for (int $d = 0; $d < ${m * dsub}; $d++) {
         |  if ($q.isNullAt($d)) {
         |    throw new IllegalArgumentException("adc_table: null element at index " + $d);
         |  }
         |}
         |Object[] $subs = new Object[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  long[] $row = new long[$ksub];
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    long $d2 = 0L;
         |    int $off = ($s * $ksub + $c) * $dsub;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      long $diff = $q.getLong($s * $dsub + $d) - $cbRef[$off + $d];
         |      $d2 += $diff * $diff;
         |    }
         |    $row[$c] = $d2;
         |  }
         |  $subs[$s] = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($row);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($subs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AdcTableExpression =
    copy(child = newChild)
}
