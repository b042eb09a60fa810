package graft.ops

import graft.SparkSpec

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked bigram NLL on a tiny corpus") {
    // corpus: "a b a b" + "a b" → bigrams: (a,b)x3, (b,a)x1; V=2
    // c1: a=3, b=3 (unigram counts over all tokens: a,b,a,b,a,b)
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("id", "t")
    val r = LangModel.bigramNll(docs, "id", "t")
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    val pAB = (3.0 + 1.0) / (3.0 + 2.0) // c2=3, c1(a)=3, V=2
    val pBA = (1.0 + 1.0) / (3.0 + 2.0)
    val qAB = math.round(-math.log(pAB) * 1e6)
    val qBA = math.round(-math.log(pBA) * 1e6)
    assert(r(0) == ((1L, 3L, 2 * qAB + qBA,
      math.round((2 * qAB + qBA) / 1e6 / 3.0 * 1e4) / 1e4)))
    assert(r(1) == ((2L, 1L, qAB, math.round(qAB / 1e6 * 1e4) / 1e4)))
  }

  test("docs with <2 tokens survive with zero score") {
    val docs = Seq((1L, "single"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "x y")).toDF("id", "t")
    val r = LangModel.bigramNll(docs, "id", "t")
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(r.map(_._1) == Seq(1L, 2L, 3L, 4L)) // every doc present
    assert(r.take(3).forall(x => x._2 == 0L && x._4 == 0.0))
    assert(r(3)._2 == 1L)
  }

  test("nll_scaled is partitioning-invariant (exact integer sums)") {
    val docs = (1 to 50).map(i =>
      (i.toLong, s"w${i % 5} w${(i + 1) % 5} w${(i + 2) % 5} common"))
      .toDF("id", "t")
    val a = LangModel.bigramNll(docs.repartition(1), "id", "t")
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    val b = LangModel.bigramNll(docs.repartition(7), "id", "t")
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("rarer continuations score higher NLL") {
    val docs = (1 to 20).map(i => (i.toLong, "the cat sat")) :+
      (21L, "the zzz sat")
    val r = LangModel.bigramNll(docs.toDF("id", "t"), "id", "t")
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(r.last._4 > r.head._4) // "the zzz" is surprising
  }
}
