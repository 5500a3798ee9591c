package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Single-pass int8 quantization audit kernel (q62's hot loop).
  *
  * Why native: the HOF form (`transform`/`aggregate`/`zip_with`) is
  * CodegenFallback — every lambda call is interpreted, and the pipeline
  * walks the 64-dim vector five times (abs-max, quantize, sum, max,
  * reconstruction error). This kernel fuses all of it into two passes
  * of one compiled method that stays inside whole-stage codegen.
  *
  * Numerical contract (bit-exact with the HOF form it replaces, gated
  * by FunctionsSpec):
  *   scale       = max(abs(x)) / 127.0
  *   code(x)     = scale == 0.0 ? 0 : floor(x / scale + 0.5) as long
  *   code_sum    = Σ code(x)         (left-to-right, exact in long)
  *   code_max    = max(abs(code(x)))
  *   max_abs_err = max(abs(x - code(x) · scale))
  * Empty input → (null, 0, null, null), matching the SQL forms
  * (array_max of an empty array is null, aggregate's init survives).
  * Elements are assumed non-null/non-NaN (parquet float vectors);
  * Java `>` comparison would diverge from Spark's NaN-greatest
  * ordering otherwise.
  */
object QuantizeKernel {
  def quantizeI8(v: ArrayData): InternalRow = {
    val n = v.numElements()
    if (n == 0)
      return new GenericInternalRow(Array[Any](null, 0L, null, null))
    var maxAbs = 0d
    var i = 0
    while (i < n) {
      val a = Math.abs(v.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    var codeSum = 0L
    var codeMax = 0L
    var maxErr = 0d
    i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val c = if (scale == 0.0) 0L else Math.floor(x / scale + 0.5).toLong
      codeSum += c
      val ca = Math.abs(c)
      if (ca > codeMax) codeMax = ca
      val err = Math.abs(x - c * scale)
      if (err > maxErr) maxErr = err
      i += 1
    }
    new GenericInternalRow(Array[Any](scale, codeSum, codeMax, maxErr))
  }
}

/** `quantize_i8(array<double>)` →
  * struct<scale double, code_sum bigint, code_max bigint,
  * max_abs_err double>.
  */
final case class QuantizeI8(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_i8 expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = true),
    StructField("code_sum", LongType, nullable = false),
    StructField("code_max", LongType, nullable = true),
    StructField("max_abs_err", DoubleType, nullable = true)))
  override def prettyName: String = "quantize_i8"
  override def nullSafeEval(input: Any): Any =
    QuantizeKernel.quantizeI8(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.QuantizeKernel.quantizeI8($c)")
  override protected def withNewChildInternal(c: Expression): QuantizeI8 =
    copy(child = c)
}
