package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._

/** Custom codegen'd Catalyst expressions for the embedding hot path.
  *
  * The generic alternative (`aggregate(zip_with(...))`) is an interpreted
  * higher-order fold — fine at the source boundary, ruinous when evaluated
  * per candidate pair: near-dup joins evaluate the dot product O(pairs)
  * times. These expressions compile to a tight primitive loop inside
  * whole-stage codegen (`doGenCode`), the preference order SURVEY §4 calls
  * out: native Expression > UDF.
  *
  * Both accept `array<float>` and `array<double>`; accumulation is always
  * double, element-by-element left-to-right (bit-identical to the DuckDB
  * oracle's formula).
  */
object VectorExprs {

  def dot(a: Column, b: Column): Column =
    Shims.column(DotProduct(Shims.expression(a), Shims.expression(b)))

  def hyperplaneSig(vec: Column, numPlanes: Int): Column =
    Shims.column(HyperplaneSig(Shims.expression(vec), numPlanes))

  private[functions] def elemType(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  def equalPositions(a: Column, b: Column): Column =
    Shims.column(EqualPositions(Shims.expression(a), Shims.expression(b)))
}

/** Count of positions where two long arrays agree — the MinHash signature
  * agreement count, evaluated once per candidate pair. */
final case class EqualPositions(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (VectorExprs.elemType(left.dataType), VectorExprs.elemType(right.dataType)) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"equalPositions requires array<bigint>, got ${left.dataType}/${right.dataType}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val n = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long c = 0L;
         |for (int i = 0; i < n; i++) {
         |  if ($a.getLong(i) == $b.getLong(i)) c++;
         |}
         |${ev.value} = c;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EqualPositions =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ in double. Arrays must be equal length (min length is used). */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (VectorExprs.elemType(left.dataType), VectorExprs.elemType(right.dataType)) match {
      case (FloatType | DoubleType, FloatType | DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot requires array<float|double>, got ${left.dataType}/${right.dataType}")
    }

  private def get(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ea, eb) = (VectorExprs.elemType(left.dataType),
      VectorExprs.elemType(right.dataType))
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += get(a, i, ea) * get(b, i, eb); i += 1 }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(arr: String, et: DataType, i: String) = et match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      val ga = getter(a, VectorExprs.elemType(left.dataType), "i")
      val gb = getter(b, VectorExprs.elemType(right.dataType), "i")
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double sum = 0.0;
         |for (int i = 0; i < n; i++) { sum += $ga * $gb; }
         |${ev.value} = sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature: bit p = sign(v · h_p) packed into a
  * long. Hyperplane components are deterministic
  * xxhash64(p, i)-derived values in [-1, 1] — identical on every executor
  * and run, computed on the fly (no broadcast state). One pass: P×dim
  * hash+multiply-adds per row. */
final case class HyperplaneSig(child: Expression, numPlanes: Int)
    extends UnaryExpression {

  require(numPlanes > 0 && numPlanes <= 64, "numPlanes in (0, 64]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.elemType(child.dataType) match {
      case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hyperplaneSig requires array<float|double>, got ${child.dataType}")
    }

  /** Component h(p, i): chained xxhash64 (seed 42 ‖ p ‖ i) → [-1, 1]. */
  @inline private def component(p: Int, i: Int): Double =
    XXH64.hashLong(i.toLong, XXH64.hashLong(p.toLong, 42L)).toDouble /
      Long.MaxValue

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val et = VectorExprs.elemType(child.dataType)
    val n = arr.numElements()
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val v = et match {
          case FloatType => arr.getFloat(i).toDouble
          case _ => arr.getDouble(i)
        }
        proj += v * component(p, i)
        i += 1
      }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = VectorExprs.elemType(child.dataType) match {
        case FloatType => s"(double) $a.getFloat(i)"
        case _ => s"$a.getDouble(i)"
      }
      val hash = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int n = $a.numElements();
         |long sig = 0L;
         |for (int p = 0; p < $numPlanes; p++) {
         |  double proj = 0.0;
         |  long seedP = $hash.hashLong((long) p, 42L);
         |  for (int i = 0; i < n; i++) {
         |    double h = (double) $hash.hashLong((long) i, seedP) / 9223372036854775807.0;
         |    proj += ($get) * h;
         |  }
         |  if (proj > 0) sig |= (1L << p);
         |}
         |${ev.value} = sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}
