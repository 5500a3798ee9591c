package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent-folding kernel behind `strip_accents` (q94): Unicode NFD
  * decomposition followed by removal of every combining mark
  * (category Mn) — 'café' → 'cafe', 'señor' → 'senor', 'naïve' →
  * 'naive'. This is the standard normalization a multilingual corpus
  * pipeline runs before exact/near dedup and lexical indexing, so that
  * composed (NFC) and decomposed (NFD) spellings — and OCR/keyboard
  * accent noise — collapse to one key. Matches DuckDB's
  * `strip_accents` on Latin-script input (the oracle pins it); base
  * characters without a decomposition (ß, æ, ø) pass through unchanged
  * in both engines.
  *
  * ASCII fast path: scan for any char ≥ 0x80 first and return the
  * input UTF8String UNCHANGED (no NFD, no copy) when pure ASCII — on a
  * mostly-ASCII web corpus the kernel is a byte scan per row, and the
  * allocation cost is paid only by the rows that actually carry
  * accents.
  */
object TextNormalize {
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    var ascii = true
    var i = 0
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) return s
    val norm = java.text.Normalizer
      .normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(norm.length)
    i = 0
    while (i < norm.length) {
      val c = norm.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `strip_accents(text)` — native codegen'd accent folding (see
  * [[TextNormalize.stripAccents]]). A custom Expression, not a UDF:
  * stays inside whole-stage codegen with no SerDe, and the ASCII fast
  * path returns the input buffer without copying.
  */
final case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects a string column, got " +
        child.dataType.simpleString)

  override def nullSafeEval(input: Any): Any =
    TextNormalize.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNormalize.stripAccents($c)")

  override protected def withNewChildInternal(
      newChild: Expression): StripAccents = copy(child = newChild)
}
