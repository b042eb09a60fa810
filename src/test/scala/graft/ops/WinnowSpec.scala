package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(df: org.apache.spark.sql.DataFrame, k: Int = 3,
      w: Int = 4): Map[Long, Set[Long]] =
    Dedup.winnowFingerprints(df, "id", "t", k, w)
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("MOSS guarantee: a shared w+k-1 token run shares a fingerprint") {
    // k=3, w=4: any common run of >= 6 tokens must collide
    val shared = "the quick brown fox jumps high"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"unrelated prefix words here $shared and a long tail end")
    ).toDF("id", "t")
    val m = fps(docs)
    assert((m(1L) & m(2L)).nonEmpty,
      s"6-token shared run must produce a common fingerprint: $m")
  }

  test("disjoint documents share nothing; density ~2/(w+1)") {
    val a = (1 to 60).map("a" + _).mkString(" ")
    val b = (1 to 60).map("b" + _).mkString(" ")
    val m = fps(Seq((1L, a), (2L, b)).toDF("id", "t"))
    assert((m(1L) & m(2L)).isEmpty)
    // 58 grams -> far fewer selected fingerprints than grams
    assert(m(1L).size < 40 && m(1L).size >= 58 / 5,
      s"winnowed density out of band: ${m(1L).size}")
  }

  test("short docs: fewer than w grams still yield one fingerprint") {
    val m = fps(Seq((1L, "just four small words")).toDF("id", "t")) // 2 grams
    assert(m(1L).size == 1, s"short doc keeps p=1's truncated min: $m")
    val empty = Dedup.winnowFingerprints(
      Seq((1L, "two words")).toDF("id", "t"), "id", "t", 3, 4)
    assert(empty.count() == 0, "fewer than k tokens -> no grams, no fps")
  }

  test("winnowIncremental: a quoting batch doc is caught; strangers are not") {
    // 12 shared tokens = two disjoint w+k-1 runs -> >= 2 shared fps
    val quote = (1 to 12).map("q" + _).mkString(" ")
    val corpus = Seq(
      (1L, s"corpus opening $quote corpus closing words"),
      (2L, (1 to 20).map("c" + _).mkString(" "))).toDF("id", "t")
    val stored = Dedup.winnowFingerprints(corpus, "id", "t", 3, 4)
    val batch = Seq(
      (10L, s"batch intro $quote batch outro"),
      (11L, (1 to 20).map("z" + _).mkString(" "))).toDF("id", "t")
    val got = Dedup.winnowIncremental(batch, "id", "t", stored, 3, 4, 2L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.exists(r => r._1 == 10L && r._2 == 1L && r._3 >= 2L),
      s"quote must be detected with >= 2 shared fps: $got")
    assert(!got.exists(_._1 == 11L), s"stranger must not pair: $got")
    assert(!got.exists(_._2 == 2L), s"unrelated corpus doc silent: $got")
  }

  test("deterministic on any partitioning") {
    val docs = (1 to 30).map(i =>
      (i.toLong, (1 to 40).map(j => "w" + (i * j % 17)).mkString(" ")))
      .toDF("id", "t")
    val a = Dedup.winnowFingerprints(docs.repartition(13), "id", "t", 3, 4)
      .as[(Long, Long)].collect().toSet
    val b = Dedup.winnowFingerprints(docs.coalesce(1), "id", "t", 3, 4)
      .as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
