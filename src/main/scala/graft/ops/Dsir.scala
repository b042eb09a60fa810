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
      buckets: Int = 1024, scale: Long = 1000000L): DataFrame =
    weightsWithRatios(corpus, idCol, textCol,
      ratioTable(corpus, idCol, textCol, target, targetTextCol,
        buckets, scale), buckets, scale)

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
    val tb = target
      .select(explode(bigrams(col(targetTextCol))).as("__bg"))
      .select(pmod(Portable.h60(col("__bg")), lit(buckets)).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__t"))
    sb.join(tb, Seq("__b"), "full_outer")
      .select(col("__b"),
        expr(s"((coalesce(__t, 0L) + 1L) * ${scale}L) div " +
          "(coalesce(__s, 0L) + 1L)").as("__r"))
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
      scale: Long = 1000000L): DataFrame = {
    val perDoc = docBucketCounts(batch, idCol, textCol, buckets)
      .join(broadcast(ratios), Seq("__b"), "left")
      .withColumn("__r", coalesce(col("__r"), lit(scale)))
      .groupBy("__id").agg(
        sum(col("__c")).as("n_bigrams"),
        sum(col("__c") * col("__r")).as("weight"))
    // ids are primary keys at every call site (the crossDocShingleFrac
    // zero-row-docs pattern) — the left join restores bigram-less docs
    batch.select(col(idCol))
      .join(perDoc.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("weight"), lit(0L)).as("weight"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          expr("weight div n_bigrams"))
          .otherwise(lit(0L)).cast(LongType).as("avg_ratio"))
  }

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

  /** Importance RESAMPLING — the paper's actual draw (arXiv:2302.03169
    * §2: sample proportionally to the importance weights, don't take
    * the top mass): a deterministic Efraimidis–Spirakis weighted
    * sample without replacement over `avg_ratio`
    * ([[Sampling.weightedTopK]] — key = ln(u)/w with u hash-derived
    * from the id, so the draw is a pure projection any engine
    * replays). Versus [[select]], high-weight documents are LIKELY,
    * not certain — the diversity-preserving behavior the paper argues
    * for (top-mass selection collapses onto near-duplicates of the
    * target). Documents with avg_ratio ≤ 0 (no bigrams) are never
    * drawn, as p ∝ w requires.
    *
    * Scale shape: the weights pass unchanged + one scan with
    * per-partition top-k heaps (TakeOrderedAndProject) — no extra
    * corpus shuffle over [[weights]]. */
  def resample(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, k: Int,
      buckets: Int = 1024, scale: Long = 1000000L,
      salt: String = "dsir"): DataFrame =
    Sampling.weightedTopK(
      weights(corpus, idCol, textCol, target, targetTextCol, buckets, scale),
      idCol, "avg_ratio", k, salt)
}
