package graft.streaming

import graft.functions.{Portable, Sketches}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types.StringType

/** Streaming twin of the portable HLL ([[graft.functions.Sketches]]):
  * per-group register arrays held as `mapGroupsWithState` state, so a
  * long-running stream answers "distinct keys per group so far" every
  * trigger without ever re-scanning history.
  *
  * State is bounded and tiny — `groups × m` ints (1 KiB per group at
  * p=8) regardless of stream length — and the per-trigger work is one
  * register-max fold over the batch's rows. Because register-max is
  * associative, commutative, and idempotent, the emitted sketch after
  * any prefix of triggers equals the batch [[Sketches.hllSketch]] over
  * the same prefix of data (the equivalence StreamSketchSpec pins), and
  * merging ALL emissions of a group — not just the last — still yields
  * exactly the final sketch (monotone growth), which makes downstream
  * consumers replay-safe under at-least-once delivery.
  */
object SketchStream {

  /** Per-group streaming HLL: emits (g, hll) with the group's register
    * array as of each trigger. Update output mode. */
  def hllByKey(df: DataFrame, groupCol: String, key: Column,
      p: Int = Sketches.DefaultP): DataFrame = {
    val m = 1 << p
    val spark = df.sparkSession
    import spark.implicits._
    val h = Portable.h60(key)
    val prepared = df.select(
        col(groupCol).cast(StringType).as("_1"),
        Sketches.regOf(h, p).as("_2"),
        Sketches.rankOf(h, p).as("_3"))
      .as[(String, Int, Int)]
    prepared.groupByKey(_._1)
      .mapGroupsWithState[Array[Int], (String, Seq[Int])](
        GroupStateTimeout.NoTimeout) { case (g, rows, state) =>
        val regs = state.getOption.getOrElse(Array.fill(m)(0))
        rows.foreach { case (_, r, k) => if (k > regs(r)) regs(r) = k }
        state.update(regs)
        (g, regs.toSeq)
      }
      .toDF("g", "hll")
  }

  /** Per-group streaming KMV (bottom-k) sketch: emits (g, kmv) with the
    * group's k smallest distinct h60 hashes as of each trigger — the
    * streaming twin of [[graft.functions.KmvAggExprs.kmvFromHashes]].
    *
    * State is ≤ 8·k bytes per group regardless of stream length, and
    * bottom-k over sets is associative, commutative, and idempotent, so
    * the emission after any prefix of triggers equals the batch sketch
    * over the same prefix, and re-merging any subset of a group's
    * emissions (at-least-once replay) still yields the final sketch —
    * the same replay-safety argument as [[hllByKey]]. Downstream,
    * pairs of emitted sketches feed the same τ-threshold overlap math
    * as `Dedup.kmvSourceOverlap` (live cross-source overlap tiles). */
  def kmvByKey(df: DataFrame, groupCol: String, key: Column, k: Int)
      : DataFrame = {
    require(k > 0, s"kmv sketch needs k > 0, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(
        col(groupCol).cast(StringType).as("_1"),
        Portable.h60(key).as("_2"))
      .as[(String, Long)]
    prepared.groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Seq[Long])](
        GroupStateTimeout.NoTimeout) { case (g, rows, state) =>
        var set = scala.collection.immutable.TreeSet.empty[Long] ++
          state.getOption.getOrElse(Array.empty[Long])
        rows.foreach { case (_, h) =>
          if (set.size < k) set += h
          else if (h < set.lastKey) {
            set += h
            if (set.size > k) set -= set.lastKey
          }
        }
        val arr = set.toArray // ascending
        state.update(arr)
        (g, arr.toSeq)
      }
      .toDF("g", "kmv")
  }

  /** Convenience: attach the fixed-point estimate to a sketch stream's
    * output (or any sketch table). */
  def withEstimate(sketches: DataFrame, p: Int = Sketches.DefaultP)
      : DataFrame =
    sketches.withColumn("est_distinct",
      round(Sketches.hllEstimate(col("hll"), p), 4))
}
