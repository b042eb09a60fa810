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
    * broken by the id itself. Adds `rk` (1-based rank within the
    * stratum, LongType).
    *
    * Scale shape: [[Ranks.grouped]] two-pass rank — range-partitioned on
    * (strata, hash), never a per-stratum single-reducer sort; with the
    * total (hash, id) order the rank equals the window `row_number`
    * exactly, so oracles replay it unchanged. */
  def stratified(df: DataFrame, strata: Seq[String], idCol: String,
      perStratum: Int): DataFrame =
    Ranks.grouped(df, strata,
        Seq(Portable.h60(col(idCol).cast("string")), col(idCol)),
        rankCol = Some("rk"))
      .filter(col("rk") <= perStratum)

  /** Small-k fast-path twin of [[stratified]]: the SAME deterministic
    * draw (the k hash-smallest ids per stratum, ties by id) computed as
    * a bounded map-side aggregate ([[graft.functions.TopKAggExprs]])
    * instead of a corpus rank — each mapper ships at most k (hash, id)
    * pairs per stratum through the shuffle, O(partitions × strata × k)
    * wire bytes where the two-pass rank range-shuffles the corpus.
    * The aggregate-vs-sort crossover: use this for small k (draws,
    * top-k per source); use [[stratified]] when the rank of EVERY row
    * is needed or k is large. Requires a NON-NULL long-castable id —
    * enforced with `raise_error` below (ADVICE r13: the aggregate
    * SKIPS null pairs per SQL discipline while [[stratified]] ranks
    * null ids first, so a nullable or non-castable id would silently
    * break the row-equality contract instead of failing loudly) — and
    * DISTINCT ids within a stratum (duplicate (hash, id) pairs collapse
    * in the bounded TreeSet where `row_number` ranks both copies; ids
    * are primary keys at every call site, asserting corpus-wide
    * distinctness would cost the shuffle this fast path exists to
    * avoid). Output: (strata…, idCol LONG, rk LONG) — row-equal to
    * [[stratified]] at the same k (`SamplingSpec` asserts it). */
  def stratifiedTopK(df: DataFrame, strata: Seq[String], idCol: String,
      perStratum: Int): DataFrame = {
    import graft.functions.TopKAggExprs
    val h = Portable.h60(col(idCol).cast("string"))
    val idL = when(col(idCol).cast("long").isNotNull,
      col(idCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"stratifiedTopK: null or non-long-castable $idCol: "),
        coalesce(col(idCol).cast("string"), lit("NULL")))).cast("long"))
    df.groupBy(strata.map(col): _*)
      .agg(TopKAggExprs.topKPairs(h, idL,
        perStratum).as("__tk"))
      .select(strata.map(col) :+
        posexplode(col("__tk")).as(Seq("__pos", "__pair")): _*)
      .select(strata.map(col) ++ Seq(
        col("__pair.v").as(idCol),
        (col("__pos") + 1).cast("long").as("rk")): _*)
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

  /** Integer threshold for a cumulative fraction of the hash space: rows
    * with h31 < threshold(f) form a deterministic f-fraction. Shared by
    * [[splitBy]] / [[weightedKeep]] and their SQL oracles so both engines
    * compare against the exact same integer. */
  def fracThreshold(f: Double): Long = math.floor(f * Portable.P).toLong

  /** Deterministic train/val/test (or any) split: each row's id hashes to
    * a point in [0, P); cumulative fraction boundaries carve the space.
    * A row's split never depends on other rows (stable under corpus
    * growth and re-partitioning), assignment is a pure projection — no
    * shuffle, no RNG, replayable by any engine. `salt` decorrelates this
    * split from other hash-keyed decisions on the same ids. */
  /** Cumulative integer boundaries for `splits` (all but the last, whose
    * boundary is P itself). Shared with the q_x_split oracle so both
    * engines compare the hash against the EXACT same integers — deriving
    * them independently (accumulated double here, literal sum there)
    * could differ in the last ulp and flip an id near a boundary. */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[Long] = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $splits")
    require(splits.forall { case (_, f) => f > 0 && f <= 1 },
      s"each split fraction must be in (0,1], got $splits")
    splits.scanLeft(0.0)(_ + _._2).tail.init.map(fracThreshold)
  }

  def splitBy(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    val h = Portable.h31(concat(lit(salt + ":"), col(idCol).cast("string")))
    // last arm is `otherwise`: h is always in [0, P), so comparing against
    // the final boundary (P itself) would be vacuously true — the
    // otherwise-arm just skips that redundant final comparison
    val assigned = splits.init.zip(splitThresholds(splits))
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), t)) =>
        val cond = h < t
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
      }
      .fold(lit(splits.head._1))(_.otherwise(lit(splits.last._1)))
    df.withColumn("split", assigned)
  }

  /** Split-integrity audit: exact-duplicate LEAKAGE across train/val/test
    * splits — a fingerprint (content identity) that appears in more than
    * one split means an eval answer is sitting in the training set even
    * though the *rows* were split correctly. Returns one row per ordered
    * split pair with the count of shared fingerprints. Run it after
    * [[splitBy]]; a dedup ([[Dedup.exactKeep]]) BEFORE splitting is the
    * fix when it fires.
    *
    * Scale: one (split, fp) distinct shuffle, then a self-join on fp
    * whose groups are bounded by the split count — never quadratic in
    * documents. Counts are exact integers (no float drift in the
    * oracle). */
  def splitLeakage(df: DataFrame, splitCol: String, fpCol: String): DataFrame = {
    val s = df.select(col(splitCol).cast("string").as("split"),
      col(fpCol).as("fp")).distinct()
    s.as("a").join(s.as("b"),
        col("a.fp") === col("b.fp") && col("a.split") < col("b.split"))
      .groupBy(col("a.split").as("split_a"), col("b.split").as("split_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Deterministic weighted sample WITHOUT replacement, k rows, inclusion
    * probability proportional to `weightCol` (Efraimidis–Spirakis A-ES,
    * "Weighted random sampling with a reservoir", IPL 97(5), 2006): each
    * row draws u ∈ (0,1] from the portable hash of its id and scores
    * key = ln(u)/w; the k LARGEST keys are exactly a weighted
    * sample-without-replacement. With the hash standing in for the RNG
    * the draw is a pure projection — same selection on any cluster size,
    * any engine (the DuckDB oracle replays it to the row).
    *
    * Scale shape: no shuffle of the corpus — `orderBy(...).limit(k)`
    * plans as TakeOrderedAndProject (per-partition top-k heaps, k-sized
    * merge at the driver), so the cost is one scan + O(k) memory —
    * the quality-weighted subsampling step a curation pipeline runs
    * over the full 100 TB corpus. Rows with weight <= 0 are excluded.
    * `salt` decorrelates from other hash-keyed decisions on the ids. */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "wsample"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (Portable.h60(concat(lit(salt + ":"), col(idCol).cast("string")))
      .cast("double") + lit(1.0)) / lit(H60Space)
    val key = log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("__wkey", key)
      .orderBy(col("__wkey").desc, col(idCol))
      .limit(k)
      .drop("__wkey")
  }

  /** 2^60 — the h60 hash-space size; shared with the q_x_weighted_sample
    * oracle so both engines compute the identical u. */
  val H60Space: Double = 1152921504606846976.0

  /** Greedy token-budget fill per group: walk each group's rows in
    * deterministic hash order and keep documents while the group's
    * running token total is under `budget` (the admitting document may
    * overshoot — standard greedy fill, so a group with any rows always
    * contributes at least one document). This is mixture construction by
    * TOKEN mass, not document count — "1M tokens per language/source" —
    * the knob mixture recipes are actually specified in, where
    * [[stratified]] (count) and [[weightedKeep]] (row-wise Bernoulli)
    * can't express the target.
    *
    * Deterministic on any cluster size / engine (hash order, not arrival
    * order). Adds `cum_tokens` (the running total INCLUDING the row).
    *
    * Scale shape: [[Ranks.grouped]] two-pass running sum — the corpus is
    * range-partitioned on (group, hash) and each partition's running
    * sums get broadcast offsets added; no per-group single-reducer
    * window at any group cardinality. */
  def tokenBudget(df: DataFrame, groupCols: Seq[String], idCol: String,
      tokenCol: String, budget: Long, salt: String = "budget"): DataFrame = {
    require(budget > 0, "budget must be positive")
    Ranks.grouped(df, groupCols,
        Seq(Portable.h60(concat(lit(salt + ":"),
          col(idCol).cast("string"))), col(idCol)),
        rankCol = None,
        sums = Seq(Ranks.RunSum(col(tokenCol), "cum_tokens")))
      .filter(col("cum_tokens") - col(tokenCol).cast("long") < budget)
  }

  /** Temperature-scaled mixture allocation — the dataset-mixing rule of
    * GPT-3/The Pile (weights ∝ count^α, α<1 upsamples small sources,
    * α=1 is proportional, α=0 uniform): split an integer `total` across
    * groups with quota_g ∝ c_g^α, exactly and replayably.
    *
    * Exact-arithmetic discipline (the cross-engine float-sum trap):
    * weights are scaled to INTEGER milli-units s_g = ⌊c_g^α·1000⌋ —
    * `sqrt`/`pow` are per-row IEEE ops both engines round identically,
    * and everything after (Σs, total·s div Σs, largest-remainder
    * distribution of the flooring leftover, ties to the smaller group
    * name) is 64-bit integer math with NO order-dependent float
    * accumulation. Caller bound: total · max(s) must fit in a long —
    * total ≤ 1e9 with counts ≤ 1e12 is safe.
    *
    * Runs on the caller's per-group counts table (O(groups) rows); the
    * empty-window scans are group-table-sized, never corpus-sized.
    * Output: (group, n, quota), Σ quota = total exactly (W=0 → all 0). */
  def temperatureMix(counts: DataFrame, groupCol: String, countCol: String,
      alpha: Double, total: Long): DataFrame = {
    require(total >= 0, "total must be non-negative")
    require(alpha >= 0, "alpha must be non-negative")
    val raw =
      if (alpha == 0.5) sqrt(col("n").cast("double"))
      else pow(col("n").cast("double"), lit(alpha))
    // pow(0,0)=1: at alpha=0 a ZERO-COUNT source would earn a full
    // uniform share it cannot supply a single row of — empty groups
    // weigh 0 at every alpha
    val weight = when(col("n") > 0, raw).otherwise(lit(0.0))
    val base = counts
      .select(col(groupCol), col(countCol).cast("long").as("n"))
      .withColumn("__s", floor(weight * 1000).cast("long"))
      .withColumn("__W", sum(col("__s")).over(Window.partitionBy()))
      .withColumn("__alloc",
        when(col("__W") > 0, expr(s"($total * __s) div __W"))
          .otherwise(lit(0L)))
      .withColumn("__rem",
        when(col("__W") > 0,
          lit(total) * col("__s") - col("__alloc") * col("__W"))
          .otherwise(lit(0L)))
    base
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col(groupCol).asc)))
      .withColumn("__atot", sum(col("__alloc")).over(Window.partitionBy()))
      .select(col(groupCol), col("n"),
        when(col("__W") > 0,
          col("__alloc") +
            when(col("__rk") <= lit(total) - col("__atot"), 1L)
              .otherwise(0L))
          .otherwise(lit(0L)).as("quota"))
  }

  /** Max-min fair (waterfilling) allocation of ONE global token budget
    * across groups — the complement of [[tokenBudget]]'s fixed
    * per-group cap: small sources keep everything, large sources are
    * clamped to a common water level `t` chosen so the total fits.
    * Exactly: quota_g = min(c_g, t) with the largest integer t such that
    * Σ quota ≤ budget (up to the ≤|groups|−1 tokens integer flooring
    * leaves unallocated — deterministic, never over budget).
    *
    * Scale shape: the heavy step is the caller's per-group token count
    * (one corpus aggregate); this runs on that aggregate. The global
    * sort window is a single-partition pass over O(groups) rows — the
    * domains table, not the corpus — plus one scalar aggregate collected
    * driver-side (eager, the [[graft.ops.Search.bm25TopK]] caveat).
    * Output: one row per group with `tokens` and `quota`. */
  def fairShareQuota(counts: DataFrame, groupCol: String,
      countCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val w = Window.orderBy(col("__c").asc, col(groupCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    // funded ⇔ raising every not-yet-processed group to this group's
    // count still fits: c_i·(n−i+1) + prefix_{i−1} ≤ budget
    val flagged = counts
      .select(col(groupCol), col(countCol).cast("long").as("__c"))
      .withColumn("__i", row_number().over(
        Window.orderBy(col("__c").asc, col(groupCol).asc)))
      .withColumn("__prefix", sum(col("__c")).over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__funded",
        col("__c") * (col("__n") - col("__i") + 1) +
          (col("__prefix") - col("__c")) <= budget)
      .localCheckpoint()
    graft.core.Metrics.deferUnpersist(flagged)
    val r = flagged.agg(
      count(when(col("__funded"), 1)).as("j"),
      sum(when(col("__funded"), col("__c"))).as("fundedSum"),
      count(lit(1)).as("n")).head()
    val j = r.getLong(0)
    val fundedSum = if (r.isNullAt(1)) 0L else r.getLong(1)
    val n = r.getLong(2)
    val t = if (n == j) Long.MaxValue
            else (budget - fundedSum) / (n - j)
    flagged.select(col(groupCol),
      col("__c").as("tokens"),
      when(col("__funded"), col("__c")).otherwise(lit(t)).as("quota"))
  }

  /** Per-group greedy trim against PER-GROUP quotas — the execution half
    * of [[fairShareQuota]]: measure (per-group token counts) → allocate
    * (waterfilling) → trim (this). Identical semantics to
    * [[tokenBudget]] except each group's budget comes from the `quotas`
    * frame (groupCol + a `quota` column) instead of one global constant;
    * the quota side is O(groups) so AQE broadcasts it. Same greedy
    * overshoot rule: the admitting row may cross the line, nothing
    * after it does. Running sum is the [[Ranks.grouped]] two-pass shape
    * (see [[tokenBudget]]); the quota join rides the ranged frame. */
  def tokenBudgetByQuota(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, quotas: DataFrame,
      salt: String = "budget"): DataFrame = {
    Ranks.grouped(df, Seq(groupCol),
        Seq(Portable.h60(concat(lit(salt + ":"),
          col(idCol).cast("string"))), col(idCol)),
        rankCol = None,
        sums = Seq(Ranks.RunSum(col(tokenCol), "cum_tokens")))
      .join(broadcast(quotas.select(col(groupCol), col("quota"))),
        Seq(groupCol))
      .filter(col("cum_tokens") - col(tokenCol).cast("long") < col("quota"))
  }

  /** Source-weighted deterministic mixing: keep a row iff its id hashes
    * under its domain's weight threshold — static corpus reweighting
    * (up/down-sampling whole sources, the DoReMi-style mixture applied at
    * curation time). Pure filter: no shuffle, no per-domain state; the
    * weight table is a when-chain literal (domains are few). Unknown
    * domains fall back to `defaultWeight`. */
  def weightedKeep(df: DataFrame, domainCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double,
      salt: String = "mix"): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(w =>
      w >= 0 && w <= 1), s"weights must be in [0,1]")
    val h = Portable.h31(concat(lit(salt + ":"), col(idCol).cast("string")))
    val default = lit(fracThreshold(defaultWeight))
    val thresh = weights.toSeq.sortBy(_._1)
      .foldLeft(Option.empty[Column]) { case (acc, (d, w)) =>
        val arm = col(domainCol) === d
        val t = lit(fracThreshold(w))
        Some(acc.fold(when(arm, t))(_.when(arm, t)))
      }
      .fold(default)(_.otherwise(default))
    df.filter(h < thresh)
  }

  /** Neyman (variance-optimal) allocation of an audit/labeling budget
    * across strata (Neyman 1934; Cochran, "Sampling Techniques" §5.5):
    * sampling n_h ∝ N_h·σ_h minimizes the variance of the stratified
    * estimate at fixed total n — the rule for "how many docs per source
    * must a human review to bound the corpus quality estimate". Uniform
    * per-stratum quotas over-sample homogeneous strata; Neyman spends
    * the budget where the metric actually varies.
    *
    * Exact-arithmetic discipline (the [[temperatureMix]] cross-engine
    * float-sum trap): N_h·σ_h = sqrt(N_h·Σx² − (Σx)²) — the radicand is
    * EXACT int64 from one count/sum/sum-of-squares aggregate, so the
    * weight is a single correctly-rounded IEEE sqrt both engines agree
    * on bit-for-bit; weights scale to integer milli-units and the
    * split is 64-bit largest-remainder math with no order-dependent
    * float accumulation. Caller bound: N_h·Σx² must stay under 2^53
    * (exact DOUBLE conversion) — e.g. 1e9 rows of values ≤ 3000.
    *
    * Allocations are capped at the stratum size AFTER the largest-
    * remainder split (Neyman can ask for more rows than a small, noisy
    * stratum has; the surplus is NOT redistributed — one pass,
    * replayable). All-constant strata (every weight 0) allocate 0
    * everywhere, like [[temperatureMix]]'s W=0 rule. NULL values
    * contribute 0 to both sums while still counting toward n (standard
    * SQL aggregation) — the radicand stays non-negative (n only grows
    * past the Cauchy–Schwarz bound), reading a null-heavy stratum as
    * higher-spread, which is the conservative direction for an audit.
    *
    * Runs as one corpus aggregate down to O(strata) rows; the windows
    * after it scan the strata table, never the corpus. Output:
    * (strataCol, n, quota). */
  def neymanAllocation(df: DataFrame, strataCol: String, valueCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val v = col(valueCol).cast("long")
    val st = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"), sum(v).as("__s"),
        sum(v * v).as("__q"))
    val base = st
      .withColumn("__sw",
        floor(sqrt((col("n") * col("__q") - col("__s") * col("__s"))
          .cast("double")) * 1000).cast("long"))
      .withColumn("__W", sum(col("__sw")).over(Window.partitionBy()))
      .withColumn("__alloc",
        when(col("__W") > 0, expr(s"($budget * __sw) div __W"))
          .otherwise(lit(0L)))
      .withColumn("__rem",
        when(col("__W") > 0,
          lit(budget) * col("__sw") - col("__alloc") * col("__W"))
          .otherwise(lit(0L)))
    base
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col(strataCol).asc)))
      .withColumn("__atot", sum(col("__alloc")).over(Window.partitionBy()))
      .select(col(strataCol), col("n"),
        least(
          when(col("__W") > 0,
            col("__alloc") +
              when(col("__rk") <= lit(budget) - col("__atot"), 1L)
                .otherwise(0L))
            .otherwise(lit(0L)),
          col("n")).as("quota"))
  }

  /** Deterministic balanced interleave — the write order for a mixed
    * training set: position = (rank within source by content hash) ×
    * nSources + sourceIndex, so a reader consuming positions in order
    * sees sources round-robin (no 10M-doc run of one crawl at the
    * front, which distorts early-training gradients) and the SAME
    * order on any cluster size, any engine, any rerun — `orderBy(rand)`
    * can promise neither.
    *
    * Scale shape: the source index comes from an O(sources) distinct
    * frame broadcast back — its single-task index window is bounded by
    * [[InterleaveSourceCap]] (enforced at runtime with `raise_error`:
    * sources are provenance labels, tens to thousands; a million-value
    * "source" column means the wrong column was passed and the empty-
    * partitionBy window would otherwise become a silent single-reducer
    * sort). The per-source rank is the [[Ranks.grouped]] two-pass shape
    * — range-partitioned, never a per-source single-reducer sort.
    * Positions are unique but NOT dense when sources are uneven (a
    * drained source leaves its residue-class slots empty — harmless
    * for ordering, and density would cost a global sort). Output: the
    * input plus `pos`. */
  val InterleaveSourceCap = 100000

  def interleave(df: DataFrame, sourceCol: String, idCol: String,
      salt: String = "interleave"): DataFrame = {
    val srcIdx = df.select(col(sourceCol)).distinct()
      .withColumn("__ns", count(lit(1)).over(Window.partitionBy()))
      .withColumn("__si",
        when(col("__ns") > InterleaveSourceCap, raise_error(concat(
          lit(s"interleave: source cardinality exceeds $InterleaveSourceCap (got "),
          col("__ns"), lit(s") — is '$sourceCol' really a provenance label?"))))
          .otherwise(row_number().over(Window.orderBy(col(sourceCol))) - 1))
    Ranks.grouped(df, Seq(sourceCol),
        Seq(Portable.h60(concat(lit(salt + ":"),
          col(idCol).cast("string"))), col(idCol)),
        rankCol = Some("__rk"))
      .join(broadcast(srcIdx), Seq(sourceCol))
      .withColumn("pos", (col("__rk") - 1L) * col("__ns") + col("__si"))
      .drop("__si", "__ns", "__rk")
  }

  /** The executing half of [[neymanAllocation]]: draw each stratum's
    * quota as the hash-smallest rows ([[stratified]]'s deterministic
    * draw — same rows on any cluster size, any engine). One corpus
    * aggregate for the quotas (O(strata) rows, broadcast back); the
    * ranked draw is the [[Ranks.grouped]] two-pass shape — range-
    * partitioned, never a per-stratum single-reducer sort. Output: the
    * sampled rows as (strataCol, idCol, valueCol, rk, quota). */
  def neymanSample(df: DataFrame, strataCol: String, valueCol: String,
      idCol: String, budget: Long, salt: String = "audit"): DataFrame = {
    val quotas = neymanAllocation(df, strataCol, valueCol, budget)
    Ranks.grouped(df.select(col(strataCol), col(idCol), col(valueCol)),
        Seq(strataCol),
        Seq(Portable.h60(concat(lit(salt + ":"),
          col(idCol).cast("string"))), col(idCol)),
        rankCol = Some("rk"))
      .join(broadcast(quotas.select(col(strataCol), col("quota"))),
        Seq(strataCol))
      .filter(col("rk") <= col("quota"))
  }
}
