package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Binary search over an EXPLICIT, driver-computed boundary array — the
  * deterministic replacement for `RangePartitioner`'s per-exchange
  * sampled boundaries inside [[graft.ops.Ranks.grouped]].
  *
  * `repartitionByRange` re-samples imbalanced input partitions with an
  * rdd.id-SEEDED RNG, so two independently planned exchanges over the
  * same data are NOT guaranteed the same row→partition map (the r13
  * sf0.1 rank corruption; r13 pinned ONE exchange via `persist`, at the
  * cost of a full-corpus materialization per rank call). This expression
  * makes the bucket id a PURE FUNCTION of the row: boundaries are
  * sampled once, shipped as a literal reference object, and every
  * evaluation — in any branch, any stage, any recompute — agrees by
  * construction. No persist, no InMemoryRelation, AQE-safe.
  *
  * Value = the number of boundaries ≤ the key tuple (lexicographic,
  * ascending, nulls first — matching `SortOrder(_, Ascending)`), i.e.
  * bucket b holds keys in (boundaries(b-1), boundaries(b)]. Equal keys
  * always share a bucket, and for a fixed group prefix the bucket id is
  * monotone in the order keys — the two invariants the two-pass rank's
  * offset arithmetic needs.
  *
  * Codegen: children evaluate inside whole-stage codegen; the search is
  * one virtual call on a reference object (the same pattern regexp /
  * from_json use) — no CodegenFallback.
  */
case class RangeBucket(keys: Seq[Expression],
    bounds: RangeBoundaries) extends Expression {

  def boundaries: Array[Array[Any]] = bounds.rows

  override def children: Seq[Expression] = keys
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "range_bucket"
  override def toString: String =
    s"range_bucket(${keys.mkString(", ")}, ${boundaries.length} bounds)"

  @transient private lazy val searcher =
    new RangeBucketSearcher(boundaries, keys.map(_.dataType).toArray)

  override def eval(input: InternalRow): Any = {
    val k = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) { k(i) = keys(i).eval(input); i += 1 }
    searcher.bucket(k)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rangeBucketSearcher", searcher,
      classOf[RangeBucketSearcher].getName)
    val arr = ctx.freshName("rbKey")
    val evals = keys.map(_.genCode(ctx))
    val fill = evals.zipWithIndex.map { case (c, i) =>
      code"""${c.code}
            |$arr[$i] = ${c.isNull} ? null : (Object) ${c.value};"""
    }.reduce(_ + _)
    ev.copy(code =
      code"""Object[] $arr = new Object[${keys.length}];
            |$fill
            |final int ${ev.value} = $ref.bucket($arr);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RangeBucket =
    copy(keys = newChildren)
}

/** Boundary rows with STRUCTURAL equality (deepEquals/deepHashCode).
  * A bare `Array[Array[Any]]` in a case-class expression compares by
  * reference, so two semantically identical [[RangeBucket]] instances
  * would never be `semanticEquals` — silently defeating exchange reuse
  * and common-subexpression elimination if callers ever stopped sharing
  * the single instance `Ranks.grouped` builds (ADVICE r14). */
final class RangeBoundaries(val rows: Array[Array[Any]])
    extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case b: RangeBoundaries =>
      java.util.Arrays.deepEquals(
        rows.asInstanceOf[Array[AnyRef]], b.rows.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.deepHashCode(rows.asInstanceOf[Array[AnyRef]])
  override def toString: String = s"RangeBoundaries(${rows.length} rows)"
}

/** The shared search/compare kernel: lexicographic tuple comparison with
  * nulls-first per field (Spark's `Ascending` default), per-type
  * interpreted orderings over Catalyst internal values. Used by the
  * expression (executor-side binary search) AND by the driver-side
  * boundary selection in [[graft.ops.Ranks]] — one comparator, so the
  * sampled sort order and the runtime bucketing cannot disagree. */
class RangeBucketSearcher(val boundaries: Array[Array[Any]],
    types: Array[DataType]) extends Serializable {

  @transient private lazy val ords: Array[Ordering[Any]] =
    types.map(TypeUtils.getInterpretedOrdering)

  def compare(a: Array[Any], b: Array[Any]): Int = {
    val os = ords
    var i = 0
    while (i < types.length) {
      val x = a(i); val y = b(i)
      val c =
        if (x == null && y == null) 0
        else if (x == null) -1
        else if (y == null) 1
        else os(i).compare(x, y)
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Count of boundaries ≤ key (first-strictly-greater index). */
  def bucket(key: Array[Any]): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (compare(boundaries(mid), key) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }
}
