package graft.ops

import graft.SparkSpec

class BandStatsSpec extends SparkSpec {
  import spark.implicits._

  test("a boilerplate-saturated corpus shows up as one corpus-sized bucket per band") {
    // every doc identical: each band has exactly ONE bucket holding all
    // n docs — the quadratic-join-about-to-happen signature the
    // diagnostic exists to catch before the candidate join runs
    val n = 12
    val docs = (1 to n).map(i =>
      (i.toLong, "the same boilerplate sentence repeated everywhere"))
      .toDF("doc_id", "text")
    val stats = Dedup.minHashBandStats(docs, "doc_id", "text",
      n = 3, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(stats.length == 16)
    assert(stats.forall(_._2 == 1L), "one bucket per band")
    assert(stats.forall(_._3 == n.toLong), "that bucket holds the corpus")
    assert(stats.forall(_._4 == (n.toLong * (n - 1)) / 2),
      "implied pairs = n(n-1)/2")
  }

  test("a diverse corpus spreads buckets; pair volume matches the banded join") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six seven"),
      (4L, "totally different words in this one here"),
      (5L, "one two three four five six eight"))
      .toDF("doc_id", "text")
    val stats = Dedup.minHashBandStats(docs, "doc_id", "text",
      n = 3, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(stats.length == 16)
    // every doc lands in every band exactly once
    assert(stats.forall(s => s._2 >= 1L && s._3 <= 5L))
    // Σ per-bucket m over a band = docs with a signature
    val perBandDocs = stats.map(_._2).zip(stats.map(_._3))
    assert(perBandDocs.nonEmpty)
    // the implied pair volume upper-bounds the distinct candidate pairs
    // the real banded join emits (same buckets, pairs deduped there)
    val cand = Dedup.minHashCandidatesPortable(docs, "doc_id", "text",
      n = 3, numHashes = 64, bands = 16, estThreshold = 0.0).count()
    val implied = stats.map(_._4).sum
    assert(implied >= cand,
      s"implied=$implied must bound distinct candidates=$cand")
  }
}
