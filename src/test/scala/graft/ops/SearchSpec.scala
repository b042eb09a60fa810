package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25: agreement with a driver-side reference scorer + ranking laws. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "hash join hash join hash"),
    (2L, "hash join"),
    (3L, "merge sort window frame"),
    (4L, "hash hash hash hash hash hash hash hash"),
    (5L, "vector hash"),
    (6L, "the quick brown fox jumps over the lazy dog"),
    (7L, ""),
    (8L, "join vector vector")
  ).toDF("doc_id", "text")

  /** Plain-Scala BM25 over whitespace tokens (lowercase corpus already
    * normalized-friendly) — the independent reference. */
  private def referenceScores(terms: Seq[String]): Map[Long, Double] = {
    val docs = corpus.as[(Long, String)].collect().toMap
    val toks = docs.map { case (id, t) =>
      id -> (if (t.trim.isEmpty) Array.empty[String]
             else t.trim.split("\\s+"))
    }
    val n = toks.size
    val avgdl = toks.values.map(_.length).sum.toDouble / n
    val dfT = terms.map(t =>
      t -> toks.values.count(_.contains(t))).toMap
    toks.flatMap { case (id, tk) =>
      val score = terms.map { t =>
        val tf = tk.count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val df = dfT(t)
          val idf = math.log(((n - df) + 0.5) / (df + 0.5) + 1.0)
          idf * ((tf * (Search.K1 + 1.0)) /
            (tf + Search.K1 * ((1.0 - Search.B) +
              (Search.B * tk.length) / avgdl)))
        }
      }.sum
      if (tk.exists(terms.contains)) Some(id -> score) else None
    }
  }

  test("scores match the driver-side reference to 4 dp, ranked") {
    val got = Search.bm25TopK(corpus, "doc_id", "text",
        Seq("hash", "vector"), k = 10)
      .as[(Long, Double)].collect().toSeq
    val want = referenceScores(Seq("hash", "vector")).toSeq
      .map { case (id, s) =>
        (id, BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }
      .sortBy { case (id, s) => (-s, id) }
    assert(got == want)
  }

  test("only documents containing a query term appear") {
    val ids = Search.bm25TopK(corpus, "doc_id", "text",
        Seq("merge"), k = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(ids == Set(3L))
  }

  test("more occurrences at equal length ranks higher; k truncates") {
    val eq = Seq(
      (1L, "hash hash hash pad pad"),
      (2L, "hash pad pad pad pad"),
      (3L, "pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val got = Search.bm25TopK(eq, "doc_id", "text", Seq("hash"), k = 1)
      .as[(Long, Double)].collect()
    assert(got.length == 1 && got.head._1 == 1L)
  }

  test("empty corpus returns empty frame, no NaN avgdl") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = Search.bm25TopK(empty, "doc_id", "text", Seq("hash"), k = 3)
    assert(got.columns.toSeq == Seq("doc_id", "score"))
    assert(got.count() == 0)
  }

  test("rrfFuse: both-list docs beat single-list docs; absent = 0") {
    val l1 = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val l2 = Seq((2L, 1), (4L, 2)).toDF("doc_id", "rank")
    val fused = Search.rrfFuse(Seq(l1, l2), "doc_id", k = 10)
      .as[(Long, Double)].collect().toMap
    def rr(r: Int) = 1.0 / (60 + r)
    assert(math.abs(fused(2L) - (rr(2) + rr(1))) < 1e-6)
    assert(math.abs(fused(1L) - rr(1)) < 1e-6)
    assert(math.abs(fused(4L) - rr(2)) < 1e-6)
    // doc 2 (in both lists) outranks every single-list doc
    assert(fused(2L) > fused(1L) && fused(2L) > fused(4L))
  }

  test("rrfFuse k truncates and orders by fused score then id") {
    val l1 = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val l2 = Seq((3L, 1), (4L, 2)).toDF("doc_id", "rank")
    val got = Search.rrfFuse(Seq(l1, l2), "doc_id", k = 2)
      .as[(Long, Double)].collect().toSeq
    // ties on score (same rank in different lists) break by id
    assert(got.map(_._1) == Seq(1L, 3L))
  }

  test("rare term contributes more than ubiquitous term (idf)") {
    val c = Seq(
      (1L, "common rare"),
      (2L, "common x"),
      (3L, "common y"),
      (4L, "common z")
    ).toDF("doc_id", "text")
    val scores = Search.bm25TopK(c, "doc_id", "text",
        Seq("common", "rare"), k = 4)
      .as[(Long, Double)].collect().toMap
    // doc 1 has both; others only the ubiquitous term
    assert(scores(1L) > scores(2L) * 1.5)
  }
}
