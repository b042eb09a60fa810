package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, composed from operators it
  * has — no custom physical plan needed, and both stay shuffle-minimal:
  *
  *  - [[asofJoin]]: one hash-shuffle on the key + an in-partition sort
  *    (the same cost envelope as a sort-merge join), NO row explosion —
  *    the classic union-then-window formulation instead of a range
  *    cross-product that a naive `t2 <= t1` theta-join would plan.
  *  - [[rangeJoin]]: pure interval join (no equi key) via band bucketing:
  *    one side keeps its time bucket, the other replicates to the three
  *    adjacent buckets, so the join is a plain equi-join on the bucket id
  *    and each qualifying pair is produced exactly once. Replication
  *    factor is a constant 3 regardless of data size — at 100 TB this is
  *    the only shape that avoids an O(n·m) theta-join.
  */
object AsOf {

  /** For every left row, attach `payload` columns from the LATEST right
    * row with the same `key` and `right(rightTime) <= left(leftTime)`;
    * ties on the timestamp break toward the highest `tieBreak` value.
    * Left rows with no qualifying right row keep null payloads (left
    * outer semantics). Both time columns must share an orderable type.
    * Payload/tieBreak names must not collide with left's columns.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tieBreak: String): DataFrame = {
    val rightCols = (payload :+ tieBreak).distinct
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right.select(
        (Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side")) ++
          rightCols.map(col)): _*)
      // SQL join semantics: a null key matches nothing. Window.partitionBy
      // would group null-keyed rows of both sides together — dropping
      // null-keyed RIGHT rows leaves null-keyed left rows alone in their
      // partition, so they keep a null payload.
      .where(col(key).isNotNull && col(rightTime).isNotNull)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows at the same timestamp (side 0 < 1),
    // so `<=` matches; among right rows with equal t the last in tieBreak
    // order wins. The payload travels as ONE struct that is null exactly
    // for left rows: last(ignoreNulls) then selects the latest right ROW
    // as a unit — a null payload field on that row stays null (per-column
    // last(ignoreNulls) would wrongly reach back to an older right row).
    val packed = when(col("__side") === 0, struct(rightCols.map(col): _*))
    val w = Window.partitionBy(key)
      .orderBy(col("__t"), col("__side"), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = unioned
      .withColumn("__asof", last(packed, ignoreNulls = true).over(w))
    attached.filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(p => col(s"__asof.$p").as(p)): _*)
  }

  /** Inner interval join: all (left, right) pairs with
    * `|left(leftTime) - right(rightTime)| <= width`. Time columns must be
    * integral (epoch micros/nanos); column names of the two sides must be
    * disjoint. Each qualifying pair appears exactly once: the left side
    * keeps its single bucket `floor(t/width)` while the right replicates
    * to buckets b-1, b, b+1 (|dt| <= width implies the bucket ids differ
    * by at most 1).
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    val lb = left.withColumn("__lb", floorDivExact(leftTime, width))
    val rbkt = floorDivExact(rightTime, width)
    val rb = right.withColumn("__rb",
      explode(array(rbkt - 1, rbkt, rbkt + 1)))
    lb.join(rb, lb("__lb") === rb("__rb"))
      .filter(abs(col(leftTime) - col(rightTime)) <= width)
      .drop("__lb", "__rb")
  }

  /** Exact floor(t/w) on integer columns. `t - pmod(t, w)` is the exact
    * multiple of `w` at or below `t` (also for negative `t`), and integral
    * `div` of an exact multiple is exact — no double math anywhere: a
    * `floor(t / w)` double bucket silently misrounds past 2^53 (epoch
    * nanos), which here would drop qualifying pairs at band boundaries.
    * Same formulation as [[graft.plans.BandedIntervalJoin]]'s expression
    * tree. */
  private def floorDivExact(timeCol: String, w: Long): Column =
    expr(s"(`$timeCol` - pmod(`$timeCol`, ${w}L)) div ${w}L")
}
