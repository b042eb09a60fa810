package graft.mask

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Group-size privacy gates — the aggregate-release counterpart of the
  * row-level [[Masker]] (reference pkg/transformer/masker masks VALUES;
  * these gate which ROWS/groups may leave at all). k-anonymity by
  * suppression (Sweeney 2002, "k-anonymity: a model for protecting
  * privacy"): a released row must be indistinguishable from at least
  * k−1 others on its quasi-identifier tuple, so rows in
  * quasi-identifier groups smaller than k are SUPPRESSED. The export
  * gate a warehouse applies before handing analysts a "de-identified"
  * extract — masking the direct identifiers is not enough when
  * (nation, segment, birth-decade) pins a single customer.
  *
  * Scale shape: one map-side-combined `groupBy(quasi…).count` reduced
  * to the quasi-tuple cardinality, joined back (AQE broadcasts the
  * group frame when it fits); no window, no skew-fragile key beyond
  * the group count itself, which partial aggregation collapses. */
object Privacy {

  /** Rows whose quasi-identifier group has ≥ k members, with the group
    * size attached as `k_group` (auditors want the achieved k, not
    * just survival). Generalize quasi columns FIRST ([[generalizeNum]])
    * — suppression alone over-deletes when a quasi column is
    * fine-grained. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long)
      : DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, s"k must be >= 1, got $k")
    val gs = quasiCols.map(col)
    val sizes = df.groupBy(gs: _*).agg(count(lit(1)).as("k_group"))
    df.join(sizes, quasiCols).filter(col("k_group") >= k)
  }

  /** Suppression audit: per quasi-group (quasi…, k_group, released ∈
    * {0,1}) — the release-rate report a privacy review reads before
    * choosing k (how much data does k=10 cost?). */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String], k: Long)
      : DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("k_group"))
      .withColumn("released", (col("k_group") >= k).cast(LongType))
  }

  /** Distinct l-diversity on top of k-anonymity (Machanavajjhala et al.
    * 2006, "l-diversity: privacy beyond k-anonymity"): the classic
    * k-anonymity failure is the HOMOGENEOUS group — k indistinguishable
    * rows that all share the sensitive value, so the attacker learns it
    * without identifying anyone. A released row's quasi-group must have
    * ≥ k members AND ≥ l distinct sensitive values; both achieved
    * figures ride along as `k_group` / `l_distinct` for the audit.
    *
    * Same 100 TB shape as [[kAnonymize]] plus one distinct aggregate:
    * Catalyst plans the `countDistinct` as a two-phase aggregate over
    * (quasi…, sensitive) — still map-side-combined, no window. */
  def lDiversify(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    val sizes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("k_group"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
    df.join(sizes, quasiCols)
      .filter(col("k_group") >= k && col("l_distinct") >= l)
  }

  /** Numeric generalization: bucket a fine-grained quasi value to its
    * band floor (`width`-sized bands — ages to decades, balances to
    * 1000s). The coarsening that trades resolution for group size
    * BEFORE suppression deletes rows. Exact integer math (`div`). */
  def generalizeNum(c: Column, width: Long): Column = {
    require(width > 0, s"band width must be positive, got $width")
    (c.cast(LongType) - pmod(c.cast(LongType), lit(width)))
  }
}
