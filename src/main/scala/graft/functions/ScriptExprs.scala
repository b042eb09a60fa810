package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Unicode script profiling as a codegen'd Catalyst expression:
  * returns `[n_letters, latin, cyrillic, han, arabic]` code-point counts
  * from a single scan of the string. Semantically identical to five
  * `regexp_replace`+`length` passes (`\p{L}`, `\p{IsLatin}`, …) — Java's
  * regex script classes ARE `Character.UnicodeScript.of` — but one scan
  * instead of five regex engines per row, inside whole-stage codegen.
  * [[graft.ops.TextOps.scriptColumns]] builds its fractions/argmax on
  * top; Catalyst's subexpression elimination evaluates the array once
  * per row however many output columns read it. */
final case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"script_counts requires a string column, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Long](5)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp)) counts(0) += 1
      Character.UnicodeScript.of(cp) match {
        case Character.UnicodeScript.LATIN    => counts(1) += 1
        case Character.UnicodeScript.CYRILLIC => counts(2) += 1
        case Character.UnicodeScript.HAN      => counts(3) += 1
        case Character.UnicodeScript.ARABIC   => counts(4) += 1
        case _                                => ()
      }
      i += Character.charCount(cp)
    }
    new GenericArrayData(counts)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val sc = ctx.freshName("sc")
      s"""String $s = $c.toString();
         |long[] $counts = new long[5];
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  if (java.lang.Character.isLetter($cp)) $counts[0]++;
         |  java.lang.Character.UnicodeScript $sc =
         |    java.lang.Character.UnicodeScript.of($cp);
         |  if ($sc == java.lang.Character.UnicodeScript.LATIN) $counts[1]++;
         |  else if ($sc == java.lang.Character.UnicodeScript.CYRILLIC) $counts[2]++;
         |  else if ($sc == java.lang.Character.UnicodeScript.HAN) $counts[3]++;
         |  else if ($sc == java.lang.Character.UnicodeScript.ARABIC) $counts[4]++;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
         |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ScriptCounts = copy(child = newChild)
}

object ScriptExprs {
  /** `[n_letters, latin, cyrillic, han, arabic]` counts, one pass. */
  def scriptCounts(c: Column): Column =
    Shims.column(ScriptCounts(Shims.expression(c)))
}
