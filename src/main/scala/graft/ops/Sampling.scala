package graft.ops

import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. `sample(fraction)`
  * with a seed is executor-count-dependent on some sources and never
  * reproducible across engines; everything here orders by a content hash,
  * so the same rows are selected on any cluster size, any engine, any
  * run — which is what dataset cards and ablation reruns need.
  */
object Sampling {

  /** Top-`perStratum` rows per stratum, ordered by the md5-derived
    * [[Portable.h60]] of the id (a uniform deterministic shuffle), ties
    * broken by the id itself. One shuffle on the strata columns; the
    * window is bounded per stratum so nothing materializes beyond the
    * per-partition sort. Adds `rk` (1-based rank within the stratum).
    */
  def stratified(df: DataFrame, strata: Seq[String], idCol: String,
      perStratum: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(Portable.h60(col(idCol).cast("string")), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= perStratum)
  }

  /** Keep rows whose id hashes into `keep` of `buckets` residue classes —
    * a deterministic Bernoulli(keep/buckets) sample that is stable under
    * corpus growth (a row's fate never depends on other rows; no shuffle,
    * no window — pure filter, fully pushed into the scan stage).
    */
  def hashMod(df: DataFrame, idCol: String, buckets: Int, keep: Int): DataFrame = {
    require(buckets > 0 && keep >= 0 && keep <= buckets)
    df.filter(pmod(Portable.h60(col(idCol).cast("string")), lit(buckets)) < keep)
  }
}
