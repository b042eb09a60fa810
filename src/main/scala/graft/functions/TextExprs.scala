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

/** A provable LOWER bound on levenshtein(left, right), computed in one
  * O(|a|+|b|) pass — the counting/content filter of the similarity-join
  * literature (Ukkonen's q-gram count bound; the same family Ed-Join,
  * Xiao et al. VLDB'08, applies between candidate generation and the DP
  * verify): every single-character edit changes at most one code point
  * on each side, so (a) |chars(a) − chars(b)| ≤ ed, and (b) the L1
  * distance between the two character histograms changes by ≤ 2 per
  * edit, giving ed ≥ ⌈L1/2⌉. Histogram buckets are the code point's
  * LEADING UTF-8 byte (256 buckets): bucket collisions only ever shrink
  * L1, so the bound stays sound. Candidates whose bound exceeds the DP
  * budget are rejected for exactly the price of a byte scan — the O(n·k)
  * banded DP never runs for them. */
final case class EditLowerBound(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"edit_lower_bound requires string columns, got " +
        s"${left.dataType}/${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    EditLowerBound.bound(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EditLowerBound.bound($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditLowerBound =
    copy(left = newLeft, right = newRight)
}

object EditLowerBound {
  /** Shared by eval and generated code (static call, no boxing). */
  def bound(a: UTF8String, b: UTF8String): Int = {
    val h = new Array[Int](256)
    var i = 0
    var na = 0
    val abytes = a.numBytes()
    while (i < abytes) {
      val fb = a.getByte(i)
      h(fb & 0xFF) += 1
      na += 1
      i += UTF8String.numBytesForFirstByte(fb)
    }
    i = 0
    var nb = 0
    val bbytes = b.numBytes()
    while (i < bbytes) {
      val fb = b.getByte(i)
      h(fb & 0xFF) -= 1
      nb += 1
      i += UTF8String.numBytesForFirstByte(fb)
    }
    var l1 = 0
    var k = 0
    while (k < 256) { l1 += math.abs(h(k)); k += 1 }
    math.max(math.abs(na - nb), (l1 + 1) / 2)
  }
}

object TextExprs {
  /** Canonical composition (NFC) — the curation-pipeline default. */
  def nfc(c: Column): Column =
    Shims.column(UnicodeNormalize(Shims.expression(c), "NFC"))

  /** Compatibility composition (NFKC): also folds width/ligature variants
    * (ﬁ→fi, full-width digits) — the aggressive pre-tokenization form. */
  def nfkc(c: Column): Column =
    Shims.column(UnicodeNormalize(Shims.expression(c), "NFKC"))

  /** Counting-filter lower bound on edit distance ([[EditLowerBound]]). */
  def editLowerBound(a: Column, b: Column): Column =
    Shims.column(EditLowerBound(Shims.expression(a), Shims.expression(b)))

  /** `levenshtein(a, b, t)` with a PER-ROW threshold column — the public
    * `functions.levenshtein` only takes a constant. The expression's
    * banded DP costs O(n·min(t,n)), so a row-adaptive budget (e.g. the
    * tightest distance the caller's similarity filter could still
    * accept for this pair's lengths) prunes work the constant form
    * spends proving −1. */
  def levenshteinThreshold(a: Column, b: Column, t: Column): Column =
    Shims.column(org.apache.spark.sql.catalyst.expressions.Levenshtein(
      Shims.expression(a), Shims.expression(b), Some(Shims.expression(t))))
}
