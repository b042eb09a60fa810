package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1 to 200)
    .map(i => (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
    .toDF("id", "lang")

  test("stratified: per-stratum cap, dense ranks, full strata kept") {
    val got = Sampling.stratified(corpus, Seq("lang"), "id", 10)
    val byLang = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang == Map("en" -> 10L, "de" -> 10L, "fr" -> 10L))
    val ranks = got.filter(col("lang") === "en")
      .select("rk").as[Long].collect().toSeq.sorted
    assert(ranks == (1L to 10L))
    // cap above stratum size keeps the whole stratum
    val all = Sampling.stratified(corpus, Seq("lang"), "id", 1000)
    assert(all.count() == 200)
  }

  test("stratifiedTopK: row-equal to stratified, bounded-agg plan") {
    val a = Sampling.stratified(corpus, Seq("lang"), "id", 10)
      .select("lang", "id", "rk").as[(String, Long, Long)].collect().toSet
    val b = Sampling.stratifiedTopK(corpus.repartition(9), Seq("lang"),
        "id", 10)
      .select("lang", "id", "rk").as[(String, Long, Long)].collect().toSet
    assert(a == b)
    // the plan is a partial-aggregated top-k, not a corpus rank: an
    // ObjectHashAggregate pair with NO range exchange and NO window
    val plan = Sampling.stratifiedTopK(corpus, Seq("lang"), "id", 10)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("topkpairsagg") || plan.contains("TopKPairsAgg")
      || plan.toLowerCase.contains("objecthashaggregate"),
      s"expected a bounded aggregate plan:\n$plan")
    assert(!plan.contains("rangepartitioning") && !plan.contains("Window"),
      s"top-k fast path must not rank the corpus:\n$plan")
    // cap above stratum size keeps whole strata, ranks dense
    val all = Sampling.stratifiedTopK(corpus, Seq("lang"), "id", 1000)
    assert(all.count() == 200)
  }

  test("stratified is partitioning-invariant (deterministic shuffle)") {
    val a = Sampling.stratified(corpus.repartition(13), Seq("lang"), "id", 5)
      .select("id").as[Long].collect().toSet
    val b = Sampling.stratified(corpus.coalesce(1), Seq("lang"), "id", 5)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.size == 15)
  }

  test("hashMod: stable under corpus growth, rate near keep/buckets") {
    val small = Sampling.hashMod(corpus.filter(col("id") <= 100), "id", 10, 3)
      .select("id").as[Long].collect().toSet
    val big = Sampling.hashMod(corpus, "id", 10, 3)
      .select("id").as[Long].collect().toSet
    // a row's fate never changes when more rows arrive
    assert(small == big.filter(_ <= 100))
    assert(big.size > 200 * 3 / 10 / 2 && big.size < 200 * 3 / 10 * 2)
    assert(Sampling.hashMod(corpus, "id", 10, 10).count() == 200)
    assert(Sampling.hashMod(corpus, "id", 10, 0).count() == 0)
  }

  test("splitBy: total partition, near-nominal rates, growth-stable") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.splitBy(corpus, "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(got.size == 200) // every row assigned exactly one split
    val byName = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(byName("train") > 140 && byName("train") < 180)
    // assignment is per-row: a smaller corpus agrees on shared ids
    val small = Sampling.splitBy(corpus.filter(col("id") <= 50), "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(small.forall { case (id, s) => got(id) == s })
    // different salt decorrelates
    val salted = Sampling.splitBy(corpus, "id", splits, salt = "other")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(salted.exists { case (id, s) => got(id) != s })
    assertThrows[IllegalArgumentException](
      Sampling.splitBy(corpus, "id", Seq("a" -> 0.5, "b" -> 0.4)))
    // fractions summing to 1 but individually out of (0,1] must throw:
    // 1.2/-0.2 would silently make the second split unreachable
    assertThrows[IllegalArgumentException](
      Sampling.splitBy(corpus, "id", Seq("a" -> 1.2, "b" -> -0.2)))
  }

  test("splitLeakage: counts fingerprints straddling splits, exact") {
    // fp "x" lands in both splits, "y" only in a, "z" only in b
    val df = Seq(
      (1L, "a", "x"), (2L, "b", "x"),   // leak
      (3L, "a", "y"), (4L, "a", "y"),   // dup but same split: no leak
      (5L, "b", "z"),
      (6L, "a", "w"), (7L, "b", "w"))   // second leak
      .toDF("id", "split", "fp")
    val got = Sampling.splitLeakage(df, "split", "fp")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "b", 2L)))
    // clean splits -> empty report
    val clean = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "split", "fp")
    assert(Sampling.splitLeakage(clean, "split", "fp").count() == 0)
  }

  test("weightedKeep: weight 1 keeps all, 0 drops all, default applies") {
    val df = corpus.withColumn("src", col("lang"))
    val kept = Sampling.weightedKeep(df, "src", "id",
        Map("en" -> 1.0, "de" -> 0.0), defaultWeight = 0.5)
      .select("id", "src").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("en", 0) == 66) // ids 3,6,...,198 all kept
    assert(!bySrc.contains("de"))
    val fr = bySrc.getOrElse("fr", 0) // 67 rows at weight 0.5
    assert(fr > 20 && fr < 47)
    // deterministic: rerun selects the identical rows
    val again = Sampling.weightedKeep(df, "src", "id",
        Map("en" -> 1.0, "de" -> 0.0), defaultWeight = 0.5)
      .select("id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
  }

  test("weightedTopK: heavy rows overrepresented, zero-weight excluded, partitioning-invariant") {
    val df = (1 to 400).map(i =>
      (i.toLong, if (i <= 100) 100.0 else if (i <= 200) 0.0 else 1.0))
      .toDF("id", "w")
    val got = Sampling.weightedTopK(df, "id", "w", k = 80)
      .select("id").as[Long].collect().toSet
    assert(got.size == 80)
    assert(!got.exists(id => id > 100 && id <= 200)) // w=0 never sampled
    // 100 rows at weight 100 vs 200 rows at weight 1: the heavy block
    // must dominate the sample far beyond its 1/3 row share
    assert(got.count(_ <= 100) > 55)
    val re = Sampling.weightedTopK(df.repartition(17), "id", "w", k = 80)
      .select("id").as[Long].collect().toSet
    assert(re == got)
  }

  test("tokenBudget: per-group mass bounded, greedy overshoot only by the admitting row") {
    val df = (1 to 100).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", 10L + i % 7)).toDF(
      "id", "grp", "toks")
    val budget = 120L
    val got = Sampling.tokenBudget(df, Seq("grp"), "id", "toks", budget)
    val perGroup = got.groupBy("grp")
      .agg(sum("toks").as("mass"), max("toks").as("mx"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
    assert(perGroup.map(_._1).toSet == Set("a", "b"))
    perGroup.foreach { case (_, mass, mx, n) =>
      assert(n > 1 && mass < budget + mx,
        s"mass $mass exceeds budget+overshoot ${budget + mx}")
    }
    // every admitted row started inside the budget
    assert(got.filter(col("cum_tokens") - col("toks") >= budget).count() == 0)
    // deterministic under repartitioning
    val re = Sampling.tokenBudget(df.repartition(13), Seq("grp"), "id",
      "toks", budget).select("id").as[Long].collect().toSet
    assert(re == got.select("id").as[Long].collect().toSet)
  }

  test("fairShareQuota: waterfilling — small sources whole, large clamped, never over budget") {
    val counts = Seq(("a", 10L), ("b", 50L), ("c", 1000L), ("d", 2000L))
      .toDF("src", "n")
    // budget 560: a(10) + b(50) funded; level t = (560-60)/2 = 250
    val got = Sampling.fairShareQuota(counts, "src", "n", budget = 560L)
      .as[(String, Long, Long)].collect().toMap2
    assert(got == Map("a" -> (10L, 10L), "b" -> (50L, 50L),
      "c" -> (1000L, 250L), "d" -> (2000L, 250L)))
  }

  test("fairShareQuota: everything fits -> quotas equal counts; tiny budget -> equal split") {
    val counts = Seq(("a", 5L), ("b", 7L)).toDF("src", "n")
    val all = Sampling.fairShareQuota(counts, "src", "n", 100L)
      .as[(String, Long, Long)].collect().toMap2
    assert(all == Map("a" -> (5L, 5L), "b" -> (7L, 7L)))
    val tiny = Sampling.fairShareQuota(counts, "src", "n", 4L)
      .as[(String, Long, Long)].collect().toMap2
    // nothing fully funded: both clamp to floor(4/2) = 2
    assert(tiny == Map("a" -> (5L, 2L), "b" -> (7L, 2L)))
  }

  test("temperatureMix: alpha=0.5 upsamples small sources, total exact") {
    val counts = Seq(("tiny", 100L), ("mid", 10000L), ("big", 1000000L))
      .toDF("src", "n")
    val got = Sampling.temperatureMix(counts, "src", "n", 0.5, 1000L)
      .as[(String, Long, Long)].collect().toMap2
    val quotas = got.view.mapValues(_._2).toMap
    // sqrt weights 10 : 100 : 1000 → ~9 : 90 : 901
    assert(quotas.values.sum == 1000L, s"total must be exact: $quotas")
    // proportional (alpha=1) would give tiny ≈ 0.099 units; sqrt gives 9
    assert(quotas("tiny") == 9L && quotas("mid") == 90L &&
      quotas("big") == 901L, quotas.toString)
  }

  test("temperatureMix: alpha=0 is uniform; degenerate zero counts all-zero") {
    val counts = Seq(("a", 1L), ("b", 1000000L), ("c", 4L)).toDF("src", "n")
    val uni = Sampling.temperatureMix(counts, "src", "n", 0.0, 9L)
      .as[(String, Long, Long)].collect().toMap2.view.mapValues(_._2).toMap
    assert(uni == Map("a" -> 3L, "b" -> 3L, "c" -> 3L))
    val zeros = Seq(("a", 0L), ("b", 0L)).toDF("src", "n")
    val z = Sampling.temperatureMix(zeros, "src", "n", 0.5, 10L)
      .as[(String, Long, Long)].collect().toMap2.view.mapValues(_._2).toMap
    assert(z == Map("a" -> 0L, "b" -> 0L))
  }

  test("temperatureMix: zero-count group gets quota 0 at every alpha") {
    // pow(0,0)=1 regression: at alpha=0 an empty source used to earn a
    // full uniform share it could not supply a single row of
    val counts = Seq(("empty", 0L), ("a", 10L), ("b", 10L)).toDF("src", "n")
    for (alpha <- Seq(0.0, 0.5, 1.0)) {
      val q = Sampling.temperatureMix(counts, "src", "n", alpha, 10L)
        .as[(String, Long, Long)].collect().toMap2.view.mapValues(_._2).toMap
      assert(q("empty") == 0L, s"alpha=$alpha: $q")
      assert(q.values.sum == 10L, s"alpha=$alpha total must stay exact: $q")
    }
  }

  test("neymanAllocation: budget goes where the variance is") {
    // three strata, 50 rows each: constant (sd 0), mild spread, wild
    // spread — Neyman must rank quotas wild > mild > constant(=0)
    val rows = (1 to 50).flatMap { i =>
      Seq(("const", i.toLong, 100L), ("mild", i.toLong, 95L + (i % 11)),
        ("wild", i.toLong, (i % 2) * 400L))
    }.toDF("src", "id", "v")
    val q = Sampling.neymanAllocation(rows, "src", "v", 30L)
      .as[(String, Long, Long)].collect().toMap2.view.mapValues(_._2).toMap
    assert(q("const") == 0L, s"zero-variance stratum must get 0: $q")
    assert(q("wild") > q("mild"), s"variance must attract budget: $q")
    assert(q.values.sum <= 30L, s"never over budget: $q")
    assert(q.values.sum >= 29L, // only the n-cap may strand budget
      s"largest remainder spends the budget: $q")
  }

  test("neymanAllocation: quota capped at stratum size; all-constant -> all zero") {
    val rows = (1 to 40).map(i =>
      (if (i <= 4) "tiny" else "big", i.toLong,
        if (i <= 4) (i % 2) * 1000L else 50L + (i % 3))).toDF("src", "id", "v")
    // tiny has 4 rows but enormous variance: Neyman wants >> 4, cap holds
    val q = Sampling.neymanAllocation(rows, "src", "v", 20L)
      .as[(String, Long, Long)].collect().toMap2
    assert(q("tiny")._2 <= q("tiny")._1, s"quota <= n: $q")
    assert(q("tiny")._2 == 4L, s"cap binds for the tiny wild stratum: $q")
    val const = (1 to 20).map(i => ("a" + i % 2, i.toLong, 7L))
      .toDF("src", "id", "v")
    val z = Sampling.neymanAllocation(const, "src", "v", 10L)
      .as[(String, Long, Long)].collect().toMap2.view.mapValues(_._2).toMap
    assert(z.values.forall(_ == 0L), s"W=0 rule: $z")
  }

  test("interleave: round-robin positions, unique, partitioning-invariant") {
    val rows = (1 to 90).map(i =>
      (Seq("a", "b", "c")(i % 3), i.toLong)).toDF("src", "id")
    val got = Sampling.interleave(rows, "src", "id")
      .select("src", "pos").as[(String, Long)].collect().toSeq
    assert(got.map(_._2).distinct.size == 90, "positions unique")
    // residue class encodes the source: balanced round-robin by design
    val bySrc = got.groupBy(_._1).view.mapValues(_.map(_._2 % 3).toSet)
    assert(bySrc.values.forall(_.size == 1), s"one residue per source")
    assert(bySrc.values.flatten.toSet == Set(0L, 1L, 2L))
    // the first nSources positions are one doc from each source
    assert(got.filter(_._2 < 3).map(_._1).toSet == Set("a", "b", "c"))
    val again = Sampling.interleave(rows.repartition(11), "src", "id")
      .select("id", "pos").as[(Long, Long)].collect().toSet
    val once = Sampling.interleave(rows.coalesce(1), "src", "id")
      .select("id", "pos").as[(Long, Long)].collect().toSet
    assert(again == once, "same order on any partitioning")
  }

  test("neymanAllocation: null values never break the radicand") {
    // nulls contribute 0 to sums but count toward n — Cauchy–Schwarz
    // keeps n·Σx²−(Σx)² >= 0, so sqrt never sees a negative
    val rows = Seq(("a", 1L, Some(10L)), ("a", 2L, None), ("a", 3L, None),
      ("b", 4L, Some(5L)), ("b", 5L, Some(9L))).toDF("src", "id", "v")
    val q = Sampling.neymanAllocation(rows, "src", "v", 4L)
      .as[(String, Long, Long)].collect().toMap2.view.mapValues(_._2).toMap
    assert(q.values.forall(x => x >= 0L), s"quotas defined under nulls: $q")
    assert(q.values.sum <= 4L)
  }

  test("neymanSample: draws exactly the quota, partitioning-invariant") {
    val rows = (1 to 120).map(i =>
      (if (i % 2 == 0) "even" else "odd", i.toLong,
        (i % 7) * 10L)).toDF("src", "id", "v")
    val quotas = Sampling.neymanAllocation(rows, "src", "v", 24L)
      .as[(String, Long, Long)].collect().toMap2.view.mapValues(_._2).toMap
    val drawn = Sampling.neymanSample(rows, "src", "v", "id", 24L)
    val bySrc = drawn.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc == quotas.filter(_._2 > 0),
      s"per-stratum draw == quota: $bySrc vs $quotas")
    val a = Sampling.neymanSample(rows.repartition(17), "src", "v", "id", 24L)
      .select("id").as[Long].collect().toSet
    val b = Sampling.neymanSample(rows.coalesce(1), "src", "v", "id", 24L)
      .select("id").as[Long].collect().toSet
    assert(a == b, "deterministic draw on any partitioning")
  }

  private implicit class Triples(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[String, (Long, Long)] =
      rows.map { case (k, a, b) => k -> (a, b) }.toMap
  }
}
