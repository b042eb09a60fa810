package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting helpers for skewed joins and aggregations (SURVEY §4 /
  * task brief: "salting for skew"). AQE's skew-join handling covers sort-
  * merge joins at runtime; salting is the static fallback when one hot key
  * dominates a hash aggregation or a broadcast-infeasible join.
  *
  * The salt is deterministic — `pmod(xxhash64(saltSrc), n)` of a caller-
  * chosen high-cardinality column — so replays and retries partition
  * identically (no `rand()`: nondeterministic exprs break retry semantics
  * and stage re-execution at scale).
  */
object Skew {

  private val SaltCol = "__salt"

  /** Add a deterministic salt in [0, n) derived from `saltSrc`. */
  def addSalt(df: DataFrame, saltSrc: Column, n: Int): DataFrame =
    df.withColumn(SaltCol, pmod(xxhash64(saltSrc), lit(n.toLong)).cast("int"))

  /** Replicate every row of the (small) build side once per salt value so
    * the salted probe side still matches. */
  def replicate(small: DataFrame, n: Int): DataFrame =
    small.withColumn(SaltCol, explode(array((0 until n).map(lit): _*)))

  /** Skew-resistant equi-join: the big (probe) side is salted by
    * `saltSrc`, the small (build) side replicated n×; the join key becomes
    * (keys…, salt), splitting each hot key across n partitions. */
  def saltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String],
      saltSrc: Column, n: Int, joinType: String = "inner"): DataFrame = {
    // the small side is replicated once per salt, so join types that
    // emit unmatched SMALL-side rows (right/full outer) would return
    // each such row n times — refuse rather than silently multiply
    val safe = Set("inner", "cross", "left", "leftouter", "leftsemi",
      "semi", "leftanti", "anti")
    require(safe.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/semi/anti join types, got $joinType")
    addSalt(big, saltSrc, n)
      .join(replicate(small, n), keys :+ SaltCol, joinType)
      .drop(SaltCol)
  }

  /** Skew-resistant count per key: salted partial counts, then a second
    * (tiny) aggregation over n partials per key. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltSrc: Column,
      n: Int): DataFrame =
    addSalt(df, saltSrc, n)
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__partial").as("count"))
}
