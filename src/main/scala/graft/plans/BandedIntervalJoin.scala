package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite pure interval theta-joins into banded
  * equi-joins.
  *
  * An inner join whose only cross-side predicate is
  * `abs(l.t - r.t) <= w` has no equi keys, so Spark plans a
  * BroadcastNestedLoopJoin (or CartesianProduct) — O(n·m) comparisons and,
  * past the broadcast threshold, a full cross shuffle. That is the classic
  * 100 TB scale-killer: the plan works in a demo and never finishes in
  * production.
  *
  * The rewrite is the [[graft.ops.AsOf.rangeJoin]] banding, applied
  * automatically at the logical plan level: the left side keeps its time
  * bucket `floor(t/w)`, the right side explodes to its three adjacent
  * buckets, the join becomes a plain equi-join on the bucket id (hash
  * join / sort-merge join, shuffle partitioned by band), and the original
  * interval predicate stays as a post-join filter — each qualifying pair
  * appears exactly once, identical semantics, O(n+m) shuffled rows.
  *
  * Guards: inner joins only; the interval conjunct's sides must be
  * integral (LONG/INT epoch-style times); the join must have NO existing
  * cross-side equality conjunct (if it has one, the hash join on that key
  * is already the right plan — and this guard also makes the rule
  * fixpoint-safe, since the rewritten join gains a band equality).
  *
  * Install via `spark.experimental.extraOptimizations` ([[graft.GraftExtensions.register]])
  * or `spark.sql.extensions=graft.GraftExtensions`.
  */
object BandedIntervalJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEquiKey = conjuncts.exists {
        case EqualTo(a, b) => crossSides(a, b, left, right)
        case EqualNullSafe(a, b) => crossSides(a, b, left, right)
        case _ => false
      }
      if (hasEquiKey) j
      else findInterval(conjuncts, left, right) match {
        case Some((lt, rt, width)) => rewrite(j, lt, rt, width)
        case None => j
      }
  }

  private def crossSides(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && a.references.nonEmpty &&
      b.references.subsetOf(right.outputSet) && b.references.nonEmpty) ||
      (a.references.subsetOf(right.outputSet) && a.references.nonEmpty &&
        b.references.subsetOf(left.outputSet) && b.references.nonEmpty)

  /** Extract (leftTime, rightTime, width) from an `abs(a-b) <= w`
    * conjunct whose operands come one from each side. */
  private def findInterval(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression, Long)] =
    conjuncts.collectFirst(Function.unlift {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), IntLit(w)) =>
        orient(a, b, w, left, right)
      case GreaterThanOrEqual(IntLit(w), Abs(Subtract(a, b, _), _)) =>
        orient(a, b, w, left, right)
      case _ => None
    })

  private object IntLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _ => None
    }
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def orient(a: Expression, b: Expression, w: Long,
      left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression, Long)] =
    if (w <= 0 || !integral(a) || !integral(b)) None
    else if (a.references.nonEmpty && a.references.subsetOf(left.outputSet) &&
      b.references.nonEmpty && b.references.subsetOf(right.outputSet))
      Some((a, b, w))
    else if (a.references.nonEmpty && a.references.subsetOf(right.outputSet) &&
      b.references.nonEmpty && b.references.subsetOf(left.outputSet))
      Some((b, a, w))
    else None

  /** Exact floor(t/w) on integers — IntegralDivide truncates toward zero,
    * so negative times need the remainder correction. No double math: a
    * Cast-to-double bucket would go wrong past 2^53 (epoch nanos). */
  private def floorDiv(t: Expression, w: Long): Expression = {
    val tl = if (t.dataType == LongType) t else Cast(t, LongType)
    val q = IntegralDivide(tl, Literal(w))
    val r = Remainder(tl, Literal(w))
    If(LessThan(r, Literal(0L)), Subtract(q, Literal(1L)), q)
  }

  private def rewrite(j: Join, lt: Expression, rt: Expression, w: Long): LogicalPlan = {
    val lBand = Alias(floorDiv(lt, w), "__band_l")()
    val newLeft = Project(j.left.output :+ lBand, j.left)

    val rBucket = floorDiv(rt, w)
    val bands = CreateArray(Seq(
      Subtract(rBucket, Literal(1L)), rBucket, Add(rBucket, Literal(1L))))
    val rBandAttr = AttributeReference("__band_r", LongType, nullable = true)()
    val newRight = Generate(Explode(bands), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(rBandAttr),
      child = j.right)

    val newCond = (EqualTo(lBand.toAttribute, rBandAttr) +:
      splitConjunctivePredicates(j.condition.get)).reduce(And)
    val joined = Join(newLeft, newRight, Inner, Some(newCond), j.hint)
    Project(j.output, joined)
  }
}
