package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Within-partition grouped running aggregates — the zero-shuffle half of
  * the two-pass distributed rank ([[graft.ops.Ranks.grouped]]).
  *
  * `Window.partitionBy(group).orderBy(key)` hashes EVERY row of a group to
  * ONE reducer for the sort — with provenance-cardinality groups (tens of
  * sources over a 100 TB corpus) that is a multi-TB single-task sort that
  * no executor finishes. The scale-safe plan is the classic two-pass rank:
  * range-partition on (group, key) so each group spans many ordered
  * partitions, compute per-partition local ranks / running sums, then add
  * the broadcast cumulative offset of the partitions before yours.
  *
  * This node is the "local" pass. It assumes nothing about distribution
  * (the caller's `repartitionByRange` sets it) and declares its ordering
  * need (group ++ order) so `EnsureRequirements` inserts exactly one
  * in-partition sort — never an exchange. Groups are then contiguous
  * within each partition, so one stateful scan per partition yields
  * `row_number()` and running `sum(w)` per (partition, group) run:
  * O(1) state, no window buffering, no shuffle.
  *
  * Spark cannot express this: a window over (partition-id, group) would
  * re-shuffle the corpus on keys Catalyst cannot know are already
  * clustered. Hence a custom operator, per the documented preference
  * order (compose > expression > custom plan > mapPartitions).
  *
  * Semantics notes:
  *  - `rankAttr` is the 1-based LOCAL row number of the row within its
  *    (physical partition, group) run, LongType, never null.
  *  - each `sumAttrs(i)` is the INCLUSIVE local running sum of
  *    `sumExprs(i)` (pre-cast by the caller to Long or Double); null
  *    inputs add 0 and the output is never null — callers that need SQL
  *    window-sum null semantics must filter nulls first (the catalog
  *    callers sum non-null counters).
  *  - the node is a column-pruning boundary (Catalyst's ColumnPruning
  *    does not know it): callers select the needed columns FIRST, which
  *    is also what keeps the parquet scan pruned.
  */
case class GroupRunningAgg(
    groupExprs: Seq[Attribute],
    orderExprs: Seq[Attribute],
    sumExprs: Seq[Attribute],
    rankAttr: Attribute,
    sumAttrs: Seq[Attribute],
    child: LogicalPlan) extends UnaryNode {
  require(sumExprs.length == sumAttrs.length,
    "one output attribute per running-sum expression")
  override def output: Seq[Attribute] = child.output ++ (rankAttr +: sumAttrs)
  override def producedAttributes: AttributeSet =
    AttributeSet(rankAttr +: sumAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): GroupRunningAgg = copy(child = newChild)
}

case class GroupRunningAggExec(
    groupExprs: Seq[Attribute],
    orderExprs: Seq[Attribute],
    sumExprs: Seq[Attribute],
    rankAttr: Attribute,
    sumAttrs: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ (rankAttr +: sumAttrs)
  override def producedAttributes: AttributeSet =
    AttributeSet(rankAttr +: sumAttrs)
  // pass-through: the caller's range partitioning survives above the node
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  // one in-partition sort, no exchange: UnspecifiedDistribution (default)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((groupExprs ++ orderExprs).map(SortOrder(_, Ascending)))

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val nSums = sumExprs.length
    val sumIsLong = sumAttrs.map(_.dataType == LongType).toArray
    val outAttrs = output
    val extraAttrs = rankAttr +: sumAttrs
    child.execute().mapPartitions({ iter =>
      val gProj = UnsafeProjection.create(groupExprs, childOutput)
      val sumEvals = sumExprs
        .map(e => BindReferences.bindReference(e: Expression, childOutput))
        .toArray
      val outProj = UnsafeProjection.create(outAttrs, childOutput ++ extraAttrs)
      val extra = new GenericInternalRow(1 + nSums)
      val joined = new JoinedRow
      var key: UnsafeRow = null
      var rn = 0L
      val accL = new Array[Long](nSums)
      val accD = new Array[Double](nSums)
      iter.map { row =>
        val k = gProj(row)
        if (key == null || k != key) {
          key = k.copy()
          rn = 0L
          java.util.Arrays.fill(accL, 0L)
          java.util.Arrays.fill(accD, 0.0)
        }
        rn += 1L
        var i = 0
        while (i < nSums) {
          val v = sumEvals(i).eval(row)
          if (v != null) {
            if (sumIsLong(i)) accL(i) += v.asInstanceOf[Long]
            else accD(i) += v.asInstanceOf[Double]
          }
          extra.update(1 + i,
            if (sumIsLong(i)) accL(i) else accD(i))
          i += 1
        }
        extra.setLong(0, rn)
        outProj(joined(row, extra))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): GroupRunningAggExec = copy(child = newChild)
}

/** Plans [[GroupRunningAgg]]; injected via
  * [[graft.GraftExtensions]] (`injectPlannerStrategy`) or
  * `spark.experimental.extraStrategies`. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupRunningAgg(g, o, s, ra, sa, child) =>
      GroupRunningAggExec(g, o, s, ra, sa, planLater(child)) :: Nil
    case _ => Nil
  }
}
