package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization for corpus canonicalization. Text scraped
  * from the web arrives in mixed normalization forms — `é` as one
  * precomposed code point (U+00E9) or as `e` + combining acute (U+0065
  * U+0301) — which breaks exact dedup, shingle hashing, and tokenizer
  * vocab lookups that all operate on code points. Canonical composition
  * (NFC) makes byte equality mean text equality again, so it belongs at
  * the very front of a curation pipeline, before any fingerprinting.
  *
  * Spark ships no normalization function; this wraps
  * `java.text.Normalizer` (the JDK's implementation of UAX #15 — the same
  * canonical composition utf8proc-based engines like DuckDB's
  * `nfc_normalize` produce, which is what makes the operator
  * oracle-checkable). ASCII-only strings are detected in O(n) and
  * returned as-is without allocating — the overwhelmingly common case in
  * an English-heavy corpus.
  */
object NormalizeText {
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) return s // NFC is the identity on ASCII; skip the round-trip
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }
}

/** Expression form of [[NormalizeText.nfc]]; static helper shared by the
  * interpreted and generated paths.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeText.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeFunctions {
  /** Column API: canonical-composition (NFC) normalization. */
  def nfcNormalize(text: Column): Column =
    column(NfcNormalize(expression(text)))
}
