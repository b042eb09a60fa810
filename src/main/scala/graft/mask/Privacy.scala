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

  /** t-closeness (Li, Li, Venkatasubramanian 2007, "t-Closeness:
    * privacy beyond k-anonymity and l-diversity"): l-diversity counts
    * distinct sensitive values but not their SKEW — a group that is
    * 3-diverse yet 98% one diagnosis still leaks strong belief. Gate:
    * the quasi-group's sensitive-value distribution must sit within
    * total-variation distance t of the GLOBAL distribution (TVD = the
    * categorical Earth-Mover's distance under unit ground distance).
    *
    * Exact integer form (oracle replays bit-for-bit, no float drift):
    * with N = corpus rows, n_g = group rows, c_v / c_gv = global /
    * in-group counts of sensitive value v,
    *
    *   2·TVD·n_g·N = Σ_v |c_gv·N − c_v·n_g|
    *               = Σ_{v present in g} (|c_gv·N − c_v·n_g| − c_v·n_g)
    *                 + n_g·N
    *
    * (the second form folds every ABSENT value's term c_v·n_g into one
    * n_g·N constant via Σ_v c_v = N — no absent-combination generation).
    * Release ⇔ tvd2_num ≤ 2·(tNum/tDen)·n_g·N, checked as
    * tvd2_num·tDen ≤ 2·tNum·n_g·N in BIGINT. `tvd2_num` and `k_group`
    * ride along for the audit.
    *
    * Scale shape: one map-side-combined (quasi…, sensitive) count, one
    * O(|sensitive values|) global count broadcast in, one per-group
    * sum, one join back — no window, nothing shuffles at corpus width
    * twice. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tNum: Long, tDen: Long, k: Long = 1L)
      : DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(tNum >= 0 && tDen > 0, s"need t >= 0 as tNum/tDen, " +
      s"got $tNum/$tDen")
    require(k >= 1, s"k must be >= 1, got $k")
    val gs = quasiCols.map(col)
    // per-(group, sensitive-value) and global-value counts — both
    // map-side combined; the global table is O(|values|) and broadcasts
    val gv = df.groupBy(gs :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("__cgv"))
    val v = df.groupBy(col(sensitiveCol))
      .agg(count(lit(1)).as("__cv"))
    // N = Σ_v c_v: one tiny action over the O(|values|) table instead
    // of a third corpus-wide pass (VERDICT r16 #2). Cache v so the
    // count job and the broadcast below share one aggregation.
    val vc = v.localCheckpoint()
    graft.core.Metrics.deferUnpersist(vc)
    val nRow = vc.agg(sum(col("__cv"))).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    // the value-level fold needs n_g BEFORE it sums — derived from the
    // (quasi…, sensitive) counts (O(groups·values) input, NOT a third
    // corpus-wide pass), then joined back; no window anywhere
    val sizes = gv.groupBy(gs: _*).agg(sum(col("__cgv")).as("k_group"))
    val terms = gv.join(broadcast(vc), Seq(sensitiveCol))
      .join(sizes, quasiCols)
      .groupBy(gs: _*)
      .agg(first(col("k_group")).as("k_group"),
        (sum(abs(col("__cgv") * lit(n) - col("__cv") * col("k_group")) -
          col("__cv") * col("k_group")) +
          first(col("k_group")) * lit(n)).as("tvd2_num"))
    df.join(terms, quasiCols)
      .filter(col("k_group") >= k &&
        col("tvd2_num") * lit(tDen) <= lit(2L * tNum) *
          col("k_group") * lit(n))
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
