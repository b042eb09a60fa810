package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.Portable

/** DSIR-style data selection — importance weights from hashed-bigram
  * features (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling", arXiv:2302.03169): score every corpus
  * document by how target-like its hashed n-gram profile is, then keep
  * the top mass. The selection step a curation pipeline runs between
  * quality gating and mixing when a small in-domain corpus (the
  * "target") should steer what survives from a huge crawl (the
  * "source").
  *
  * Engine-portable scoring (the repo's rational-score discipline —
  * BENCHNOTES; DuckDB must replay bit-for-bit): the paper's weight is
  * `Σ_b c_b(doc) · log((t_b+1)/(s_b+1))` over feature buckets b. The
  * log is not cross-engine-stable, so this computes the LINEAR-ratio
  * twin in pure BIGINT arithmetic:
  *
  *   r_b     = ((t_b + 1) · scale) div (s_b + 1)      (per-bucket ratio)
  *   weight  = Σ_b c_b(doc) · r_b                      (per-doc BIGINT)
  *   avg_r   = weight div n_bigrams                    (length-free score)
  *
  * +1 smoothing as in the paper; the global p_target/p_source
  * normalizers are constants across buckets and cannot change any
  * ordering, so they are dropped (this also keeps every intermediate
  * under BIGINT: r_b ≤ scale·(T+1) with T the target bigram count —
  * the target is an eval-set-sized corpus by design, so at scale=10⁶
  * and T ≤ 10⁹ the per-doc sum stays < 2⁶³ for any document under ~10⁵
  * bigrams).
  *
  * Scale shape: one explode of corpus bigrams and one of target
  * bigrams; every count is a map-side-combined aggregate (a hot bucket
  * collapses per input partition — never a window); the ratio table is
  * O(buckets) rows (default 1024) and BROADCASTS onto the per-doc
  * bucket counts; one final per-doc aggregation. No corpus-wide
  * window, no skew-fragile key, nothing driver-side beyond the
  * broadcast hint.
  */
object Dsir {

  private def bigrams(text: Column): Column = {
    val toks = TextOps.tokens(TextOps.normalized(text))
    zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Per-document importance weights of `corpus` against `target`.
    * Returns one row per corpus document:
    * (idCol, n_bigrams, weight, avg_ratio) — all LongType; documents
    * with no bigrams carry zeros. Deterministic: md5-derived bucket
    * hash ([[Portable.h60]]), integer arithmetic throughout. */
  def weights(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 1024, scale: Long = 1000000L): DataFrame = {
    // the r19 rewrite no longer routes through ratioTable, which owned
    // this check — without it buckets <= 0 yields pmod(h60, 0) = null
    // bucket ids and silently zero-ish weights (ADVICE r19)
    require(buckets > 0 && scale > 0, "need buckets > 0 and scale > 0")
    // ONE corpus tokenize+explode pass, not two: the per-(doc, bucket)
    // counts feed BOTH the ratio table's source-side bucket sums and
    // the scoring join, but the two references do not share work in the
    // executed plan (measured: the final adaptive plan carries two
    // Generate explodes over the corpus and zero ReusedExchange), so
    // the seam is materialized once — the slim 3-long-column frame, not
    // the corpus — exactly the pipeline-stage checkpoint pattern. At
    // corpus scale this halves the dominant cost (the corpus pass);
    // the checkpoint is O(docs × touched buckets) rows.
    val dbc = docBucketCounts(corpus, idCol, textCol, buckets)
      .localCheckpoint()
    graft.core.Metrics.deferUnpersist(dbc)
    val sb = dbc.groupBy("__b").agg(sum(col("__c")).as("__s"))
    val ratios = ratioFromSourceSums(sb, target, targetTextCol, buckets,
      scale)
    scoreLinear(corpus.select(col(idCol)), idCol, dbc, ratios, scale)
  }

  /** Ratio table from prebuilt source-side bucket sums (__b, __s) —
    * the shared tail of [[ratioTable]]. */
  private def ratioFromSourceSums(sb: DataFrame, target: DataFrame,
      targetTextCol: String, buckets: Int, scale: Long): DataFrame = {
    val tb = target
      .select(explode(bigrams(col(targetTextCol))).as("__bg"))
      .select(pmod(Portable.h60(col("__bg")), lit(buckets)).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__t"))
    sb.join(tb, Seq("__b"), "full_outer")
      .select(col("__b"),
        expr(s"((coalesce(__t, 0L) + 1L) * ${scale}L) div " +
          "(coalesce(__s, 0L) + 1L)").as("__r"))
  }

  /** Linear-ratio scoring over prebuilt per-(doc, bucket) counts — the
    * shared tail of [[weightsWithRatios]]; `ids` restores bigram-less
    * documents with zeros. */
  private def scoreLinear(ids: DataFrame, idCol: String, dbc: DataFrame,
      ratios: DataFrame, scale: Long): DataFrame = {
    val perDoc = dbc
      .join(broadcast(ratios), Seq("__b"), "left")
      .withColumn("__r", coalesce(col("__r"), lit(scale)))
      .groupBy("__id").agg(
        sum(col("__c")).as("n_bigrams"),
        sum(col("__c") * col("__r")).as("weight"))
    ids
      .join(perDoc.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("weight"), lit(0L)).as("weight"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          expr("weight div n_bigrams"))
          .otherwise(lit(0L)).cast(LongType).as("avg_ratio"))
  }

  /** Per-(doc, bucket) hashed-bigram counts — the only corpus-sized
    * aggregate; its key is (id, bucket): high-cardinality, map-side
    * combined. */
  private def docBucketCounts(df: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(bigrams(col(textCol))).as("__bg"))
      .select(col("__id"),
        pmod(Portable.h60(col("__bg")), lit(buckets)).as("__b"))
      .groupBy("__id", "__b").agg(count(lit(1)).as("__c"))

  /** The O(buckets) ratio table (__b, __r) — the BOUNDED, persistable
    * artifact of the operator: once a warehouse stores it, every later
    * ingest batch scores against the frozen corpus/target statistics
    * with ZERO corpus work ([[weightsWithRatios]] — the
    * minhash-incremental pattern). Outer on the source side so buckets
    * seen only in the target still score (s_b = 0 → max ratio).
    * `div`, not `/`: Spark's `/` on BIGINT goes through DOUBLE, which
    * silently loses integer precision past 2^53 — div stays integral. */
  def ratioTable(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 1024, scale: Long = 1000000L): DataFrame = {
    require(buckets > 0 && scale > 0, "need buckets > 0 and scale > 0")
    val sb = docBucketCounts(corpus, idCol, textCol, buckets)
      .groupBy("__b").agg(sum(col("__c")).as("__s"))
    ratioFromSourceSums(sb, target, targetTextCol, buckets, scale)
  }

  /** Score `batch` against a prebuilt [[ratioTable]] — the ingest-time
    * path: one explode + map-side aggregate over the BATCH only, one
    * broadcast of the bounded ratio frame; the corpus and target are
    * never re-read. A bucket absent from the stored table was empty in
    * BOTH corpus and target at build time, so its ratio is
    * (0+1)·scale div (0+1) = scale — the left join's coalesce supplies
    * exactly that. */
  def weightsWithRatios(batch: DataFrame, idCol: String, textCol: String,
      ratios: DataFrame, buckets: Int = 1024,
      scale: Long = 1000000L): DataFrame =
    // ids are primary keys at every call site (the crossDocShingleFrac
    // zero-row-docs pattern) — the left join restores bigram-less docs
    scoreLinear(batch.select(col(idCol)), idCol,
      docBucketCounts(batch, idCol, textCol, buckets), ratios, scale)

  /** Importance SELECTION: the `k` most target-like documents by
    * length-free score (avg_ratio desc, id asc — total order, so any
    * engine replays the exact set). Plans as TakeOrderedAndProject —
    * bounded per-partition top-k, never a global sort. */
  def select(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, k: Int,
      buckets: Int = 1024, scale: Long = 1000000L): DataFrame =
    weights(corpus, idCol, textCol, target, targetTextCol, buckets, scale)
      .orderBy(col("avg_ratio").desc, col(idCol).asc)
      .limit(k)

  /** Fixed-point LOG-ratio table (__b, __lr): `⌊ln((t_b+1)/(s_b+1))·10⁶⌋`
    * as BIGINT micro-nats — the paper's per-bucket log-likelihood term,
    * quantized so per-DOC sums are exact integer arithmetic (a double
    * sum's value depends on reduction order and would never
    * hash-compare across engines; the single per-bucket `ln` + `floor`
    * is a deterministic scalar both engines compute identically — the
    * q_x_weighted_sample precedent). Buckets absent from both corpora
    * score ln(1/1) = 0, which is exactly what a missing row coalesces
    * to downstream. */
  def logRatioTable(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "need buckets > 0")
    val sb = docBucketCounts(corpus, idCol, textCol, buckets)
      .groupBy("__b").agg(sum(col("__c")).as("__s"))
    logRatioFromSourceSums(sb, target, targetTextCol, buckets)
  }

  /** Log-ratio table from prebuilt source-side bucket sums — the shared
    * tail of [[logRatioTable]]. */
  private def logRatioFromSourceSums(sb: DataFrame, target: DataFrame,
      targetTextCol: String, buckets: Int): DataFrame = {
    val tb = target
      .select(explode(bigrams(col(targetTextCol))).as("__bg"))
      .select(pmod(Portable.h60(col("__bg")), lit(buckets)).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__t"))
    sb.join(tb, Seq("__b"), "full_outer")
      .select(col("__b"),
        floor(log((coalesce(col("__t"), lit(0L)) + lit(1L))
            .cast(DoubleType) /
          (coalesce(col("__s"), lit(0L)) + lit(1L)).cast(DoubleType)) *
          lit(1e6)).cast(LongType).as("__lr"))
  }

  /** Importance RESAMPLING — the paper's actual draw (arXiv:2302.03169
    * §2: sample ∝ the importance weight, don't take the top mass) as a
    * deterministic Gumbel-top-k: w(doc) = Π_b ((t_b+1)/(s_b+1))^{c_b}
    * is the paper's unnormalized likelihood ratio, so
    * log w = Σ_b c_b·ln((t_b+1)/(s_b+1)) — accumulated EXACTLY as
    * BIGINT micro-nats via [[logRatioTable]] — and the k largest
    * `log w + Gumbel(u)` keys are precisely a p ∝ w sample without
    * replacement (the Gumbel-max trick; u is hash-derived from the id,
    * so any engine replays the draw to the row; the normalizer shifts
    * every key equally and cancels). The r15 first cut drew over the
    * LINEAR ratio sum `avg_ratio`, whose compressed dynamic range made
    * the draw near-uniform (0/50 target members at sf0.1 vs select's
    * 12/50) — the log-likelihood restores the paper's enrichment while
    * keeping the diversity the top-mass select destroys.
    *
    * LENGTH NORMALIZATION: the paper scores fixed-size chunks; over
    * variable-length documents the raw log-likelihood is dominated by
    * the length term (every populated bucket carries ≈ ln(|target|/
    * |corpus|), so log w ≈ that constant × n_bigrams — measured at
    * sf0.1: the raw-weight draw picked short docs, 1/50 target members
    * vs the top-mass select's 12/50). The draw therefore uses the
    * PER-BIGRAM mean `logw_micro div n_bigrams` (exact integer div) —
    * sampling ∝ the geometric-mean likelihood ratio, the standard
    * per-token adaptation, length-free like [[weights]]' avg_ratio.
    *
    * Output: (idCol, n_bigrams, logw_micro, avg_logw_micro) — exact
    * integer µnats; bigram-less documents carry the empty product's
    * log w = 0 and legitimately participate.
    *
    * Scale shape: identical to [[weights]] (one corpus explode + one
    * target explode, map-side
    * aggregates, one O(buckets) broadcast) + one scan with
    * per-partition top-k heaps (TakeOrderedAndProject). */
  def resample(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, k: Int,
      buckets: Int = 1024, salt: String = "dsir"): DataFrame = {
    require(k > 0, "k must be positive")
    // no longer inherited from logRatioTable after the r19 one-pass
    // rewrite (ADVICE r19): fail fast instead of null bucket ids
    require(buckets > 0, "need buckets > 0")
    // one corpus pass, shared by the log-ratio table and the scoring
    // join — same measured rationale as [[weights]]
    val dbc = docBucketCounts(corpus, idCol, textCol, buckets)
      .localCheckpoint()
    graft.core.Metrics.deferUnpersist(dbc)
    val sb = dbc.groupBy("__b").agg(sum(col("__c")).as("__s"))
    val lr = logRatioFromSourceSums(sb, target, targetTextCol, buckets)
    val perDoc = dbc
      .join(broadcast(lr), Seq("__b"), "left")
      .withColumn("__lr", coalesce(col("__lr"), lit(0L)))
      .groupBy("__id").agg(
        sum(col("__c")).as("n_bigrams"),
        sum(col("__c") * col("__lr")).as("logw_micro"))
    val scored = corpus.select(col(idCol))
      .join(perDoc.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logw_micro"), lit(0L)).as("logw_micro"))
      .withColumn("avg_logw_micro",
        when(col("n_bigrams") > 0,
          expr("logw_micro div n_bigrams"))
          .otherwise(lit(0L)).cast(LongType))
    // u ∈ (0,1) strictly (the +0.5/2⁶⁰ midpoint — u = 1 would send the
    // double-ln Gumbel to +∞); g = −ln(−ln u); key = mean log w + g
    val u = (Portable.h60(concat(lit(salt + ":"), col(idCol).cast("string")))
      .cast(DoubleType) + lit(0.5)) / lit(Sampling.H60Space)
    val key = col("avg_logw_micro").cast(DoubleType) / lit(1e6) -
      log(-log(u))
    scored
      .withColumn("__gkey", key)
      .orderBy(col("__gkey").desc, col(idCol))
      .limit(k)
      .drop("__gkey")
  }
}
