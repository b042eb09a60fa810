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
      .select("rk").as[Int].collect().toSeq.sorted
    assert(ranks == (1 to 10))
    // cap above stratum size keeps the whole stratum
    val all = Sampling.stratified(corpus, Seq("lang"), "id", 1000)
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
}
