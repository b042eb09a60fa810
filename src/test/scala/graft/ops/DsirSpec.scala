package graft.ops

import graft.SparkSpec
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Semantics of the DSIR importance weights (hashed-bigram linear-ratio
  * variant): hand-computed weights on a tiny corpus, target-affinity
  * ordering, zero-bigram handling, and the broadcast-ratio plan shape. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target-speak: "alpha beta" bigrams; crawl-speak: "noise words"
  private def corpus = Seq(
    (1L, "alpha beta alpha beta alpha beta"), // pure target-speak
    (2L, "noise words noise words noise words"), // pure crawl-speak
    (3L, "alpha beta noise words"), // mixed
    (4L, ""), // no bigrams
    (5L, "single")) // one token — no bigrams
    .toDF("doc_id", "text")

  private def target = Seq(
    (100L, "alpha beta alpha beta")).toDF("doc_id", "text")

  test("weights: hand-computed on a tiny corpus") {
    val got = Dsir.weights(corpus, "doc_id", "text", target, "text",
        buckets = 1024, scale = 1000000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // bucket ids of the involved bigrams
    def b(s: String) = Math.floorMod(Portable.h60(s), 1024L)
    // corpus bigram occurrences per bucket (docs 1,2,3):
    //   "alpha beta"×(3+1)=4, "beta alpha"×2, "noise words"×(3+1)=4,
    //   "words noise"×2, "beta noise"×1
    val s = Map(b("alpha beta") -> 4L, b("beta alpha") -> 2L,
      b("noise words") -> 4L, b("words noise") -> 2L,
      b("beta noise") -> 1L).withDefaultValue(0L)
    // target: "alpha beta"×2, "beta alpha"×1
    val t = Map(b("alpha beta") -> 2L, b("beta alpha") -> 1L)
      .withDefaultValue(0L)
    def r(bk: Long) = (t(bk) + 1L) * 1000000L / (s(bk) + 1L)
    val w1 = 3 * r(b("alpha beta")) + 2 * r(b("beta alpha"))
    val w2 = 3 * r(b("noise words")) + 2 * r(b("words noise"))
    val w3 = r(b("alpha beta")) + r(b("beta noise")) + r(b("noise words"))
    assert(got(1L) == ((5L, w1, w1 / 5)))
    assert(got(2L) == ((5L, w2, w2 / 5)))
    assert(got(3L) == ((3L, w3, w3 / 3)))
    assert(got(4L) == ((0L, 0L, 0L)) && got(5L) == ((0L, 0L, 0L)))
    // the point of the operator: target-speak outranks crawl-speak
    assert(got(1L)._3 > got(3L)._3 && got(3L)._3 > got(2L)._3)
  }

  test("select: top-k by (avg_ratio desc, id) with a bounded-sort plan") {
    val sel = Dsir.select(corpus, "doc_id", "text", target, "text", k = 2)
    assert(sel.select("doc_id").as[Long].collect().toSeq == Seq(1L, 3L))
    assert(sel.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "selection must plan a bounded per-partition top-k, not a global sort")
  }

  test("weightsWithRatios == weights restricted to the batch; unseen " +
      "buckets score the smoothed floor") {
    val ratios = Dsir.ratioTable(corpus, "doc_id", "text", target, "text")
    // incremental scoring of a corpus subset against the frozen table
    // equals the batch-mode rows for those ids
    val batch = corpus.filter(col("doc_id") >= 3)
    val got = Dsir.weightsWithRatios(batch, "doc_id", "text", ratios)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = Dsir.weights(corpus, "doc_id", "text", target, "text")
      .filter(col("doc_id") >= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
    // a NEW doc whose bigrams were never seen at build time: every
    // bucket misses the table and scores (0+1)*scale div (0+1) = scale
    val novel = Seq((99L, "zzzq wwwk zzzq")).toDF("doc_id", "text")
    val nw = Dsir.weightsWithRatios(novel, "doc_id", "text", ratios)
      .collect().head
    assert(nw.getLong(1) == 2L)
    // both bigrams may or may not collide with built buckets; the
    // avg_ratio must be >= the minimum table ratio and the weight
    // consistent with n_bigrams * avg within integer-div slack
    assert(nw.getLong(2) >= nw.getLong(1) * 1L &&
      nw.getLong(3) == nw.getLong(2) / nw.getLong(1))
  }

  test("plan: ratio table broadcasts; no window operators") {
    val plan = Dsir.weights(corpus, "doc_id", "text", target, "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"expected the O(buckets) ratio table to broadcast:\n$plan")
    assert(!plan.contains("Window ["),
      s"dsir must not plan a window:\n$plan")
  }

  test("resample: Gumbel-top-k over exact micro-nat log-likelihood — " +
      "k rows, deterministic, weight-sensitive") {
    val drawn = Dsir.resample(corpus, "doc_id", "text", target, "text",
      k = 3).collect()
    assert(drawn.length == 3)
    // determinism: same seed-salt, same draw
    val again = Dsir.resample(corpus, "doc_id", "text", target, "text",
      k = 3).collect().map(_.getLong(0)).toSeq
    assert(again == drawn.map(_.getLong(0)).toSeq)
    // a different salt redraws u per id; result is still a valid k-draw
    val salted = Dsir.resample(corpus, "doc_id", "text", target, "text",
      k = 3, salt = "other").collect()
    assert(salted.length == 3)
    // weight-sensitivity: logw_micro = Σ c_b·⌊ln((t+1)/(s+1))·1e6⌋ must
    // match a driver-side replay for every drawn row
    val lr = Dsir.logRatioTable(corpus, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lr.values.exists(_ != 0L)) // the table is non-trivial
    drawn.foreach { r =>
      assert(r.schema.fieldNames.toSeq ==
        Seq("doc_id", "n_bigrams", "logw_micro", "avg_logw_micro"))
      // the per-bigram mean is the exact truncating integer div
      if (r.getLong(1) > 0)
        assert(r.getLong(3) == r.getLong(2) / r.getLong(1))
      else assert(r.getLong(3) == 0L)
    }
  }

  test("resample enriches when importance weights actually differ " +
      "(disjoint-vocabulary target)") {
    // two languages with disjoint vocabularies: target-speak docs score
    // avg log-ratio ≈ ln((t+1)/(s+1)) near 0; crawl-speak buckets have
    // t = 0 → strongly negative. The gap (several nats) dwarfs the
    // Gumbel noise (σ ≈ 1.28), so the draw must land on target-speak.
    val big = ((1L to 10L).map(i => (i, "alpha beta gamma delta " * 5)) ++
      (11L to 20L).map(i => (i, "noise words crawl junk " * 5)))
      .toDF("doc_id", "text")
    // a heavy target: t_b ≈ 50 per alpha bucket vs s_b ≈ 48 pushes the
    // alpha/noise mean-log-ratio gap to ~3.9 nats — decisive vs Gumbel σ
    val tgt = Seq((100L, "alpha beta gamma delta " * 50))
      .toDF("doc_id", "text")
    val drawn = Dsir.resample(big, "doc_id", "text", tgt, "text", k = 5)
      .collect().map(_.getLong(0))
    assert(drawn.count(_ <= 10L) >= 4,
      s"expected a target-speak majority, got ${drawn.mkString(",")}")
    // and on a FLAT-weight fixture (target = the corpus itself) the draw
    // degenerates to the plain hash-uniform sample — p ∝ w with equal w
    val flat = Dsir.resample(big, "doc_id", "text", big, "text", k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(flat.size == 5) // valid draw; both languages eligible
  }

  test("select threads scale through to weights (signature consistency)") {
    // with a different scale the top-k SET can only be computed
    // consistently if select passes scale down — compare against the
    // manual compose at the same scale
    val viaSelect = Dsir.select(corpus, "doc_id", "text", target, "text",
      k = 2, scale = 500L).collect().map(_.getLong(0)).toSeq
    val manual = Dsir.weights(corpus, "doc_id", "text", target, "text",
      scale = 500L)
      .orderBy(col("avg_ratio").desc, col("doc_id").asc).limit(2)
      .collect().map(_.getLong(0)).toSeq
    assert(viaSelect == manual)
  }
}
