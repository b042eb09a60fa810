package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Algebraic laws of the round-10 operators, checked over seeded random
  * inputs (failures replay deterministically). */
class Round10PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260814)

  test("fairShareQuota laws: never over budget, per-group cap, common water level, near-exhaustive") {
    for (trial <- 1 to 10) {
      val n = 2 + rnd.nextInt(15)
      val counts = (1 to n).map(i => (s"g$i", rnd.nextInt(5000).toLong))
      val total = counts.map(_._2).sum
      val budget = rnd.nextInt(1 + total.toInt * 3 / 2).toLong
      val got = Sampling.fairShareQuota(
        counts.toDF("g", "c"), "g", "c", budget)
        .as[(String, Long, Long)].collect()
        .map { case (g, c, q) => g -> (c, q) }.toMap
      val quotas = got.values.map(_._2)
      assert(quotas.sum <= budget, s"trial $trial over budget")
      got.values.foreach { case (c, q) =>
        assert(q <= c || c == q, s"trial $trial quota over count") }
      got.values.foreach { case (c, q) => assert(q <= c) }
      // clamped groups all share one water level
      val clamped = got.values.filter { case (c, q) => q < c }.map(_._2)
      assert(clamped.toSet.size <= 1, s"trial $trial uneven water level")
      // allocation is near-exhaustive: leftover < number of clamped
      // groups (integer flooring), or everything fit
      if (total > budget)
        assert(budget - quotas.sum < math.max(1, clamped.size.toLong),
          s"trial $trial left too much on the table")
      else
        assert(quotas.sum == total)
    }
  }

  test("tokenBudgetByQuota: per-group mass bounded by its own quota (greedy overshoot only)") {
    val rows = (1 to 120).map(i =>
      (s"g${i % 4}", i.toLong, 1L + rnd.nextInt(50).toLong))
      .toDF("g", "id", "toks")
    val counts = rows.groupBy("g")
      .agg(sum(col("toks")).as("c"))
    val quotas = Sampling.fairShareQuota(counts, "g", "c", budget = 900L)
      .select(col("g"), col("quota"))
    val qMap = quotas.as[(String, Long)].collect().toMap
    val kept = Sampling.tokenBudgetByQuota(rows, "g", "id", "toks", quotas)
      .as[(String, Long, Long, Long, Long)].collect()
    kept.groupBy(_._1).foreach { case (g, rs) =>
      val mass = rs.map(_._3).sum
      val maxRow = rs.map(_._3).max
      assert(mass - maxRow < qMap(g),
        s"group $g over quota beyond the admitting row")
    }
  }

  test("containment dominates jaccard: every jaccard pair is a containment pair at the same threshold") {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (1L to 40L).map { i =>
      val len = 3 + rnd.nextInt(8)
      (i, (0 until len).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val t = 0.25
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, t)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cont = Dedup.ngramContainmentPairs(docs, "doc_id", "text", 3, t)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(jac.subsetOf(cont),
      s"missing: ${jac.diff(cont)} — containment >= jaccard always")
  }

  test("histogramDrift: non-negative, zero iff shares equal, symmetric") {
    val a = (1 to 300).map(_ => rnd.nextInt(6).toLong).toDF("b")
    val b = (1 to 200).map(_ => rnd.nextInt(8).toLong).toDF("b")
    val ab = CorpusStats.histogramDrift(a, b, "b")
      .select("b", "drift").as[(Long, Double)].collect().toMap
    val ba = CorpusStats.histogramDrift(b, a, "b")
      .select("b", "drift").as[(Long, Double)].collect().toMap
    assert(ab.values.forall(_ >= 0.0))
    assert(ab == ba, "symmetric chi-square must not depend on side order")
    val self = CorpusStats.histogramDrift(a, a, "b")
      .select("drift").as[Double].collect()
    assert(self.forall(_ == 0.0))
  }

  test("lengthOutliers: bounds are member values and the flag matches them") {
    val rows = (1 to 500).map(i =>
      (s"s${i % 3}", i.toLong, rnd.nextInt(10000).toLong))
      .toDF("src", "id", "v")
    val got = TextOps.lengthOutliers(rows, Seq("src"), "id", "v")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    val bySrc = got.groupBy(_._1)
    bySrc.foreach { case (_, rs) =>
      val vs = rs.map(_._3).toSet
      val (lo, hi) = (rs.head._4, rs.head._5)
      assert(rs.forall(r => r._4 == lo && r._5 == hi),
        "one bound pair per group")
      assert(vs.contains(lo) && vs.contains(hi),
        "discrete bounds must be member values")
      rs.foreach { r =>
        assert(r._6 == (r._3 < lo || r._3 > hi), "flag matches bounds") }
    }
  }

  test("heavyKeys: shares consistent with counts and ordering is by weight") {
    val df = (1 to 400).map(_ => s"k${rnd.nextInt(30)}").toDF("k")
    val got = CorpusStats.heavyKeys(df, Seq("k"), 8)
      .as[(String, Long, Double)].collect()
    assert(got.length == 8)
    assert(got.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
    got.foreach { case (_, n, s) =>
      assert(math.abs(s - n / 400.0) < 1e-6) }
  }
}
