package graft.ops

import graft.GraftExtensions
import graft.plans.GroupRunningAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Two-pass distributed per-group rank and running sums — the scale-safe
  * replacement for `Window.partitionBy(group).orderBy(key)`.
  *
  * The window form ships EVERY row of a group to ONE reducer for the
  * sort. With provenance-cardinality groups (source, language — tens of
  * values) that is the canonical 100 TB scale-killer: a multi-TB
  * single-task sort. The two-pass plan (Teradata-era distributed rank;
  * the `repartitionByRange` technique already shipped in
  * [[graft.warehouse.Layout.zorder]]):
  *
  *  1. range-partition the corpus on (group ++ orderKeys) — each group
  *     spans MANY partitions, each partition holds contiguous, ordered
  *     runs of its groups; skewed groups naturally receive more
  *     partitions because the range sampler sees more of their keys;
  *  2. in-partition sort + one stateful scan ([[GroupRunningAgg]], a
  *     custom zero-shuffle physical operator) yields each row's LOCAL
  *     rank / running sums within its (partition, group) run;
  *  3. a per-(partition, group) count/sum aggregate — map-side combined,
  *     O(partitions × groups) rows — turns into per-group cumulative
  *     offsets by partition id, broadcast back;
  *  4. global rank = offset + local rank; global running sum = offset
  *     sum + local running sum.
  *
  * The only corpus-wide movement is the ONE range exchange (shared by
  * the stats branch via exchange reuse). No hash-by-group exchange, no
  * single-reducer sort, at any group cardinality or skew.
  *
  * Determinism: with a total order key (the catalog callers order by
  * `(h60(id), id)`) the two-pass rank equals the window `row_number`
  * exactly — any valid ranking of a total order IS the ranking — so
  * DuckDB oracles replay it bit-for-bit. With ties in the key the rank
  * is a valid but arbitrary tie permutation (same contract as
  * `row_number`); tie-insensitive consumers (winsorize bound selection)
  * are unaffected.
  *
  * Bounded frames: the offsets frame is O(numPartitions × |groups|)
  * rows by construction (the driver-artifact contract — e.g. 10k
  * partitions × 100 sources = 1M tiny rows, broadcastable); its window
  * scans THAT frame, never the corpus.
  *
  * The custom node is a column-pruning boundary: callers select the
  * columns they need FIRST (the catalog queries do), which is also what
  * keeps the parquet scan pruned.
  */
object Ranks {

  /** One running sum: `expr` (cast to long or double per `isLong`)
    * accumulated in key order within the group, INCLUSIVE of the
    * current row, null inputs adding 0. `totalCol`, when set, adds the
    * per-GROUP total of `expr` to every row (broadcast from the stats
    * frame — no second corpus pass). */
  final case class RunSum(expr: Column, runningCol: String,
      totalCol: Option[String] = None, isLong: Boolean = true)

  private final val Pid = "__gr_pid"
  private final val Lrn = "__gr_lrn"

  /** Adds to `df`: `rankCol` (1-based per-group rank in `orderCols`
    * order, LongType), each sum's running column, each requested total
    * column, and `totalCountCol` (per-group row count) when set.
    * Column names in `df` must be distinct from the generated ones.
    * `orderCols` must be plain ascending expressions (the range
    * partitioner and the node's sort must agree on direction). */
  def grouped(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      rankCol: Option[String] = Some("rk"),
      sums: Seq[RunSum] = Nil,
      totalCountCol: Option[String] = None,
      numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "grouped rank needs at least one order key")
    val spark = df.sparkSession
    GraftExtensions.register(spark) // idempotent; installs the strategy
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions

    // materialize order keys / sum inputs as columns so the partitioner,
    // the node's sort requirement, and the stats branch share one
    // resolved attribute per expression
    val okNames = orderCols.indices.map(i => s"__gr_ok$i")
    val wNames = sums.indices.map(i => s"__gr_w$i")
    var base = df
    okNames.zip(orderCols).foreach { case (nm, c) =>
      base = base.withColumn(nm, c) }
    wNames.zip(sums).foreach { case (nm, s) =>
      base = base.withColumn(nm,
        s.expr.cast(if (s.isLong) LongType else DoubleType)) }

    val gs = groupCols.map(col)
    // The ranged+pid frame MUST be computed through ONE exchange
    // instance: the local pass and the stats pass both consume it, and
    // two independently-planned repartitionByRange exchanges are NOT
    // guaranteed the same boundaries — RangePartitioner re-samples
    // imbalanced input partitions with an rdd.id-SEEDED RNG, so pids
    // can disagree between executions (observed at sf0.1: dropped rows
    // and q_norm > 1 from offset mismatch; invisible at sf0.01 where
    // the reservoir sample suffices). persist() pins ONE
    // InMemoryRelation shared by both branches; boundaries are computed
    // once per exchange instance (ShuffleExchangeExec builds its
    // partitioner once), and an eviction recompute re-reads the same
    // shuffle id — so pids stay consistent even without cache
    // residency. Lazy (no extra job), lineage stays visible to the
    // plan audit, and the cached bytes are the slim projected frame
    // (callers pre-select). Explicit numPartitions additionally exempts
    // the exchange from AQE coalescing.
    val ranged = base
      .repartitionByRange(n, (gs ++ okNames.map(col)): _*)
      .withColumn(Pid, spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Metrics.deferUnpersist(ranged)

    // local pass: zero-shuffle custom operator over the range exchange
    val analyzed = Shims.analyzed(ranged)
    def attr(name: String) = analyzed.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name missing"))
    val node = GroupRunningAgg(
      groupExprs = groupCols.map(attr),
      orderExprs = okNames.map(attr),
      sumExprs = wNames.map(attr),
      rankAttr = AttributeReference(Lrn, LongType, nullable = false)(),
      sumAttrs = sums.zip(wNames).map { case (s, nm) =>
        AttributeReference(nm + "_ls",
          if (s.isLong) LongType else DoubleType, nullable = false)() },
      child = analyzed)
    val local = Shims.ofRows(spark, node)

    // stats pass: per-(partition, group) count/sums — map-side combined,
    // O(numPartitions × |groups|) rows. Aggregating over the NODE's
    // output (not `ranged`) matters: the node is a pruning boundary, so
    // both branches keep byte-identical children below it and the range
    // exchange is REUSED — the corpus is scanned and shuffled once, not
    // once per branch (ColumnPruning would otherwise specialize the two
    // exchanges apart and defeat ReuseExchange).
    val statAggs = count(lit(1)).as("__gr_c") +:
      wNames.map(nm => sum(col(nm)).as(nm + "_t"))
    val stats = local.groupBy((col(Pid) +: gs): _*)
      .agg(statAggs.head, statAggs.tail: _*)

    // cumulative offsets per group by partition id — a window over the
    // BOUNDED stats frame (numPartitions × groups rows), never the corpus
    val wOff = Window.partitionBy(gs: _*).orderBy(col(Pid))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(gs: _*)
    var off = stats
      .withColumn("__gr_ocnt", coalesce(sum(col("__gr_c")).over(wOff), lit(0L)))
    wNames.zip(sums).foreach { case (nm, s) =>
      val zero = if (s.isLong) lit(0L) else lit(0.0)
      off = off.withColumn(nm + "_o",
        coalesce(sum(col(nm + "_t")).over(wOff), zero))
      s.totalCol.foreach { tc =>
        off = off.withColumn(tc,
          coalesce(sum(col(nm + "_t")).over(wTot), zero)) }
    }
    totalCountCol.foreach { tc =>
      off = off.withColumn(tc, sum(col("__gr_c")).over(wTot)) }

    val carried = Seq("__gr_ocnt") ++ wNames.map(_ + "_o") ++
      sums.flatMap(_.totalCol) ++ totalCountCol
    val offSel = off.select(
      (col(Pid).as("__gr_opid") +:
        groupCols.zipWithIndex.map { case (g, i) => col(g).as(s"__gr_og$i") }) ++
        carried.map(col): _*)

    // broadcast join back on (pid, group) — null-safe on the group keys
    // (null group values are real groups)
    val cond = ((col(Pid) === col("__gr_opid")) +:
      groupCols.zipWithIndex.map { case (g, i) =>
        col(g) <=> col(s"__gr_og$i") }).reduce(_ && _)
    var out = local.join(broadcast(offSel), cond)
    rankCol.foreach { rc =>
      out = out.withColumn(rc, col("__gr_ocnt") + col(Lrn)) }
    wNames.zip(sums).foreach { case (nm, s) =>
      out = out.withColumn(s.runningCol, col(nm + "_o") + col(nm + "_ls")) }

    val internal = Seq(Pid, Lrn, "__gr_opid", "__gr_ocnt") ++
      okNames ++ wNames ++ wNames.map(_ + "_ls") ++ wNames.map(_ + "_o") ++
      groupCols.indices.map(i => s"__gr_og$i")
    out.drop(internal: _*)
  }
}
