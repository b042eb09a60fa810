package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-level reporting aggregates keyed by provenance (domain / source /
  * crawl snapshot) — the curation dashboard view: how much text each
  * source contributes, how internally duplicated it is, and its average
  * document shape. Web-corpus pipelines gate whole domains on exactly
  * these numbers (per-domain dup rate and size priors) before any
  * per-document filtering runs.
  *
  * Scale design: ONE hash-aggregate shuffle on the domain key. The
  * fingerprint and token count are per-row projections computed before
  * the exchange, and every aggregate (count, approx/exact distinct, sum)
  * has a map-side partial — the shuffle carries one partial row per
  * (partition, domain). Domain keys are few (thousands) relative to
  * documents, so the reduce side is trivially small; a pathological
  * single-domain corpus degenerates to one reducer row, not a skewed
  * explosion. At 100 TB swap `countDistinct` for
  * `approx_count_distinct` (HLL partial-aggregates; exact distinct
  * carries the fingerprint set through the shuffle) — kept exact here so
  * the oracle can verify values bit-for-bit.
  */
object CorpusStats {

  /** Per-domain stats: document count, distinct-content count, duplicate
    * rate, total/mean whitespace-token counts. Ratios are single IEEE
    * divisions of exact integers, rounded to 6 places (oracle-stable). */
  def domainStats(df: DataFrame, domainCol: String, textCol: String)
      : DataFrame = {
    val perDoc = df.select(
      col(domainCol).as("domain"),
      TextOps.fingerprint(col(textCol)).as("__fp"),
      TextOps.tokenCount(col(textCol)).cast(LongType).as("__nt"))
    perDoc.groupBy("domain").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("__fp")).as("n_unique"),
        sum(col("__nt")).as("total_tokens"))
      .select(col("domain"), col("n_docs"), col("n_unique"),
        round(lit(1.0) - col("n_unique").cast(DoubleType) /
          col("n_docs"), 6).as("dup_rate"),
        col("total_tokens"),
        round(col("total_tokens").cast(DoubleType) / col("n_docs"), 4)
          .as("mean_doc_tokens"))
  }

  /** The 100 TB form of [[domainStats]]: `approx_count_distinct` (HLL++)
    * replaces exact distinct, so the shuffle carries one fixed-size HLL
    * sketch per (partition, domain) instead of the full fingerprint set —
    * the difference between O(domains) and O(documents) bytes on the
    * wire when domains are heavily duplicated. `rsd` is the standard
    * relative error knob (default 5%, floor ~0.4%); dashboards gating
    * domains on dup-rate bands don't need the exact count. Kept separate
    * from the exact form because the oracle value-checks the latter. */
  def domainStatsApprox(df: DataFrame, domainCol: String, textCol: String,
      rsd: Double = 0.05): DataFrame = {
    val perDoc = df.select(
      col(domainCol).as("domain"),
      TextOps.fingerprint(col(textCol)).as("__fp"),
      TextOps.tokenCount(col(textCol)).cast(LongType).as("__nt"))
    perDoc.groupBy("domain").agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col("__fp"), rsd).as("n_unique"),
        sum(col("__nt")).as("total_tokens"))
      .select(col("domain"), col("n_docs"), col("n_unique"),
        // approximate distinct can exceed n_docs within rsd — clamp so a
        // dup-rate report never goes (nonsensically) negative
        round(greatest(lit(0.0), lit(1.0) -
          col("n_unique").cast(DoubleType) / col("n_docs")), 6)
          .as("dup_rate"),
        col("total_tokens"),
        round(col("total_tokens").cast(DoubleType) / col("n_docs"), 4)
          .as("mean_doc_tokens"))
  }

  /** Snapshot diff — corpus versioning report between two crawls/dumps:
    * per-document status (`added` / `removed` / `changed` / `unchanged`)
    * from a full outer join on the id with content-fingerprint compare.
    * One key shuffle (both sides hash-partition on the id); the
    * fingerprint is computed per side before the exchange, so the join
    * carries (id, fp) pairs, never document payloads. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      fpCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"), col(fpCol).as("__fp_old"))
    val n = newSnap.select(col(idCol).as("id"), col(fpCol).as("__fp_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_new").isNull, "removed")
          .when(col("__fp_old") =!= col("__fp_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Top-`k` heaviest keys with their exact share of all rows — the
    * skew profile consulted before choosing a salting factor or an AQE
    * skew threshold ([[Skew]]). One partial-aggregated count + a
    * TakeOrdered; the total is a 1-row scalar collected driver-side
    * (eager) so the share needs no second pass or 1-row join. */
  def heavyKeys(df: DataFrame, keyCols: Seq[String], k: Int = 10)
      : DataFrame = {
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val totalRow = df.agg(count(lit(1)).as("t")).head()
    val total = totalRow.getLong(0)
    counts
      .orderBy(col("n").desc +: keyCols.map(c => col(c).asc): _*)
      .limit(k)
      .withColumn("share",
        if (total == 0L) lit(0.0)
        else round(col("n").cast(DoubleType) / lit(total.toDouble), 6))
  }

  /** Distribution drift between two corpus snapshots over a shared
    * bucket column: per-bucket shares and the symmetric chi-square
    * contribution (p−q)²/(p+q) — the PSI-style drift screen run between
    * crawls, with rational arithmetic instead of PSI's `ln` so any SQL
    * engine replays the scores bit-for-bit. Buckets absent from one
    * side contribute with a zero count (full outer). The heavy step is
    * the two bucket counts; the compare runs on O(buckets) rows. */
  def histogramDrift(a: DataFrame, b: DataFrame, bucketCol: String)
      : DataFrame = {
    def side(df: DataFrame, n: String) =
      df.groupBy(col(bucketCol)).agg(count(lit(1)).as(n))
    val ca = side(a, "n_a"); val cb = side(b, "n_b")
    val ta = math.max(1L, a.count()); val tb = math.max(1L, b.count())
    val joined = ca.join(cb, Seq(bucketCol), "full_outer")
      .select(col(bucketCol),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val p = col("n_a").cast(DoubleType) / lit(ta.toDouble)
    val q = col("n_b").cast(DoubleType) / lit(tb.toDouble)
    joined.select(col(bucketCol), col("n_a"), col("n_b"),
      round(p, 6).as("p_a"), round(q, 6).as("p_b"),
      round((p - q) * (p - q) / (p + q), 6).as("drift"))
  }

  /** Column profile — the data-quality screen every ingest runs before
    * trusting a new table: per column, row count, null count, exact
    * distinct count, and min/max (cast to string so one schema carries
    * every column type; pick string-stable types for cross-engine
    * value checks — ints/strings/dates, not doubles/timestamps).
    *
    * Plan shape: one SINGLE-distinct aggregation branch per column,
    * unioned — each branch is a column-pruned scan with map-side
    * partials and the planner's efficient two-level distinct rewrite.
    * The tempting alternative (every column's `countDistinct` in ONE
    * `agg`) plans the multi-distinct via Expand — |cols|+1 projected
    * copies of every row through the shuffle — and measured 7.6 s where
    * the per-column branches run 0.6 s warm on the same table (sf0.1
    * lineitem, 6 columns, 12.7×); k cheap columnar scans beat one
    * k×-inflated shuffle. At 100 TB swap
    * `countDistinct` for `approx_count_distinct` (the [[domainStats]]
    * trade); exact here so the oracle verifies values. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast(StringType).as("min_s"),
          max(col(c)).cast(StringType).as("max_s"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionAll _)
  }

  /** Per-group winsorization — clamp a numeric column to its group's
    * [pLow, pHigh] nearest-rank percentile bounds (Tukey's robust
    * pre-screen: a handful of mega-documents otherwise dominate token
    * budgets, mean-based quality gates, and mixture weights; dropping
    * them discards signal, clamping keeps the row at a sane magnitude).
    *
    * Nearest-rank (not interpolated) on purpose: bound = the ⌈p·n⌉-th
    * smallest VALUE in the group — pure integer rank math over a sort,
    * so any SQL engine reproduces the exact bound (interpolated
    * percentile definitions differ across engines; rank selection
    * cannot). p·n is one IEEE multiply on an exact-integer n, ceil'd —
    * identical everywhere.
    *
    * Scale shape (the bounds-only two-pass plan): ranks come from
    * [[Ranks.grouped]] — range-partitioned two-pass rank, never a
    * per-group single-reducer sort — then ONE partial-aggregated pass
    * reduces the ranked frame to an O(groups) bounds table
    * (`max(v where rn <= ⌈p·n⌉)` = the ⌈p·n⌉-th smallest value), which
    * broadcast-joins back. No corpus-wide window at all. Ties in the
    * value order don't matter — the selected BOUND is a value at a
    * rank, identical under any tie permutation, so the arbitrary
    * two-pass tie order is harmless. Output: the input row plus
    * (lo, hi, v_wins). */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      pLow: Double, pHigh: Double): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow <= pHigh,
      s"need 0 <= pLow <= pHigh <= 1, got [$pLow, $pHigh]")
    val v = col(valueCol).cast(LongType)
    val ranked = Ranks.grouped(df, groupCols, Seq(col(valueCol)),
      rankCol = Some("__rn"), totalCountCol = Some("__n"))
    val bounds = ranked.groupBy(groupCols.map(col): _*)
      .agg(
        // p=0 selects rank 0 = nothing: an empty lower bound clamps at
        // the group minimum (no-op), an empty upper at the maximum
        coalesce(max(when(col("__rn") <= ceil(col("__n") * pLow), v)),
          min(v)).as("__lo"),
        coalesce(max(when(col("__rn") <= ceil(col("__n") * pHigh), v)),
          max(v)).as("__hi"))
    val bSel = bounds.select(
      (groupCols.zipWithIndex.map { case (g, i) => col(g).as(s"__bg$i") } :+
        col("__lo")) :+ col("__hi"): _*)
    val cond = groupCols.zipWithIndex
      .map { case (g, i) => col(g) <=> col(s"__bg$i") }.reduce(_ && _)
    // probe side: the ORIGINAL frame, not ranked.drop(...) — the clamp
    // needs no rank, and re-deriving the input through the rank plan
    // re-paid the bucket exchange + running-rank scan + offsets join on
    // a branch that only ever used the raw columns (measured: 8 → 5
    // exchanges, wall −30% at sf0.1; rows identical by construction
    // since grouped() is row-preserving)
    df.join(broadcast(bSel), cond)
      .withColumn("lo", col("__lo"))
      .withColumn("hi", col("__hi"))
      .withColumn("v_wins", least(greatest(v, col("lo")), col("hi")))
      .drop((groupCols.indices.map(i => s"__bg$i") ++
        Seq("__lo", "__hi")): _*)
  }

  /** Per-group EXACT nearest-rank quantiles — the corpus-shape report
    * (p10/p50/p90/p99 of doc length per source) behind mixture and
    * budget decisions. Nearest-rank like [[winsorize]]: the p-quantile
    * is the VALUE at rank ⌈p·n⌉ in the group — rank selection over the
    * two-pass distributed rank ([[Ranks.grouped]] — no per-group
    * single-reducer sort, unlike `percentile` / a group window), so any
    * SQL engine reproduces the exact member value (interpolating
    * definitions differ across engines; rank selection cannot).
    * `approx_percentile` is the cheaper-but-inexact alternative; this
    * is the exact twin at one range exchange. Output: one row per
    * (group, p) — (groupCols…, p, value). Requires every p ∈ (0, 1]. */
  def groupedQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"every p must be in (0,1], got $ps")
    val ranked = Ranks.grouped(df, groupCols, Seq(col(valueCol)),
      rankCol = Some("__rn"), totalCountCol = Some("__n"))
    val isTarget = ps.map(p => col("__rn") === ceil(col("__n") * p))
      .reduce(_ || _)
    ranked.filter(isTarget)
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .filter(col("__rn") === ceil(col("__n") * col("p")))
      .select(groupCols.map(col) ++ Seq(col("p"),
        col(valueCol).cast(LongType).as("value")): _*)
  }

  /** Per-group rank-based quantile normalization: q = (rank−1)/(n−1)
    * ∈ [0,1], where rank is the MIN rank of the value in its group
    * (`rank()` — ties share a rank, so equal values get equal q with
    * no tiebreak column and no cross-engine order dependence).
    * Single-member groups sit at 0.5.
    *
    * The cross-source calibration step quality gates need: an absolute
    * "keep score ≥ 0.7" threshold means different things on different
    * sources (a clean-encyclopedia score distribution sits far above a
    * web crawl's); normalizing to within-source quantiles makes ONE
    * gate mean "the top 30% of every source". Exact integer rank math
    * plus one final division — engine-portable. Adds `q_norm`.
    *
    * Scale shape: one partial-aggregated corpus reduce to the distinct
    * (group, value) frame with counts, then [[Ranks.grouped]]'s
    * two-pass running sum over THAT frame (cumulative count of smaller
    * values = the SQL `rank()` minus one — ties collapse into one
    * value-frame row, so min-rank semantics are exact by construction),
    * then one shuffle join back on (group, value). No corpus-wide
    * window; the value frame is bounded by distinct values per group,
    * and the join keys are finer than the group key, so neither side
    * has a single-reducer task. */
  def quantileNormalize(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    // lazy seam: the rank's boundary-sample pass and its main pass both
    // consume this AGGREGATE — unmaterialized, the groupBy would run
    // twice (the r14 rank samples explicitly; rfm's chained-rank
    // pattern). The frame is bounded by distinct (group, value) pairs.
    val vc = df.groupBy((groupCols.map(col) :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(false)
    graft.core.Metrics.deferUnpersist(vc)
    val ranked = Ranks.grouped(vc, groupCols, Seq(col(valueCol)),
      rankCol = None,
      sums = Seq(Ranks.RunSum(col("__c"), "__cum",
        totalCol = Some("__n"))))
    val qmap = ranked.select(
      (groupCols.zipWithIndex.map { case (g, i) => col(g).as(s"__qg$i") } :+
        col(valueCol).as("__qv")) :+
        when(col("__n") > 1,
          round((col("__cum") - col("__c")).cast(DoubleType) /
            (col("__n") - 1).cast(DoubleType), 6))
          .otherwise(lit(0.5)).as("q_norm"): _*)
    val cond = (groupCols.zipWithIndex.map { case (g, i) =>
      col(g) <=> col(s"__qg$i") } :+ (col(valueCol) <=> col("__qv")))
      .reduce(_ && _)
    df.join(qmap, cond)
      .drop((groupCols.indices.map(i => s"__qg$i") :+ "__qv"): _*)
  }

  /** Robust per-group outlier screen: median/MAD instead of mean/stddev
    * (Hampel's rule; Leys et al. 2013, "Detecting outliers: do not use
    * standard deviation around the mean, use absolute deviation around
    * the median") — a handful of 100 MB crawl blobs inflate a mean/σ
    * gate until nothing is an outlier; the median and MAD are immune to
    * up to 50% contamination. Complements [[winsorize]]/`lengthOutliers`
    * (quantile CUTS at fixed p) with a spread-scaled rule: flag
    * |v − median| > cut·MAD.
    *
    * Exact-arithmetic discipline: both the median and the MAD are
    * nearest-rank VALUES (rank ⌈n/2⌉ — member selection, not
    * interpolation), so with a long-castable value every derived
    * number — |v−med|, MAD, the cut·MAD comparison — is exact int64
    * that any SQL engine replays bit-for-bit. Tie order inside the
    * rank is irrelevant: the selected bound is identical under any tie
    * permutation (the [[winsorize]] argument).
    *
    * Scale shape: two [[Ranks.grouped]] passes (values, then absolute
    * deviations) — range-partitioned two-pass ranks, never a per-group
    * single-reducer sort — each reduced to an O(groups) frame that
    * broadcast-joins back. `valueCol` must be non-null (null rank
    * order differs across engines).
    *
    * Output: input row + (med, mad, is_outlier ∈ {0,1} LongType). */
  def madOutliers(df: DataFrame, groupCols: Seq[String], idCol: String,
      valueCol: String, cut: Int = 3): DataFrame = {
    require(cut > 0, "cut must be positive")
    val gs = groupCols.map(col)
    val slim = df.select((gs :+ col(idCol)) :+ col(valueCol): _*)
    val v = col(valueCol).cast(LongType)
    def medianOf(in: DataFrame, c: Column, out: String): DataFrame =
      Ranks.grouped(in, groupCols, Seq(c),
          rankCol = Some("__rn"), totalCountCol = Some("__n"))
        .groupBy(gs: _*)
        .agg(max(when(col("__rn") <= ceil(col("__n") * 0.5),
          c.cast(LongType))).as(out))
    def bJoin(left: DataFrame, right: DataFrame, keep: Seq[String])
        : DataFrame = {
      val r = right.select(
        groupCols.zipWithIndex.map { case (g, i) =>
          col(g).as(s"__mg$i") } ++ keep.map(col): _*)
      val cond = groupCols.zipWithIndex
        .map { case (g, i) => col(g) <=> col(s"__mg$i") }.reduce(_ && _)
      left.join(broadcast(r), cond)
        .drop(groupCols.indices.map(i => s"__mg$i"): _*)
    }
    // chained-rank seam (the rfm/qnorm pattern): rank 2's boundary
    // sample AND main pass both consume this frame — unmaterialized,
    // the whole rank-1 pipeline would re-execute per consumer. Lazy:
    // the sample pass is its first action and materializes it.
    val withMed = bJoin(slim,
        medianOf(slim, col(valueCol), "med"), Seq("med"))
      .withColumn("__ad", abs(v - col("med")))
      .localCheckpoint(false)
    graft.core.Metrics.deferUnpersist(withMed)
    val withMad = bJoin(withMed,
      medianOf(withMed, col("__ad"), "mad"), Seq("mad"))
    withMad
      .withColumn("is_outlier",
        (col("__ad") > lit(cut.toLong) * col("mad")).cast(LongType))
      .drop("__ad")
  }
}
