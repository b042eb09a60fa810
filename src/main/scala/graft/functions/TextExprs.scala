package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a codegen'd Catalyst expression. Web corpora
  * mix precomposed (NFC) and decomposed (NFD) encodings of the same
  * visible text — "café" has two byte representations — which silently
  * breaks exact dedup, fingerprinting, and tokenization downstream.
  * Normalizing first makes every byte-level operator see one canonical
  * form. Spark ships no normalization built-in, so this is the custom-
  * `Expression` altitude (same tier as [[VectorExprs]]): per-row JDK
  * `java.text.Normalizer` inside whole-stage codegen — no UDF
  * serialization boundary, stays inside the generated loop. */
final case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && UnicodeNormalize.Forms(form))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires a string column and form in " +
        s"${UnicodeNormalize.Forms.mkString("/")}, got ${child.dataType}/$form")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}

object TextExprs {
  /** Canonical composition (NFC) — the curation-pipeline default. */
  def nfc(c: Column): Column =
    Shims.column(UnicodeNormalize(Shims.expression(c), "NFC"))

  /** Compatibility composition (NFKC): also folds width/ligature variants
    * (ﬁ→fi, full-width digits) — the aggressive pre-tokenization form. */
  def nfkc(c: Column): Column =
    Shims.column(UnicodeNormalize(Shims.expression(c), "NFKC"))
}
