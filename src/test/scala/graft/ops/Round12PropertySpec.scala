package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Algebraic laws of the round-12 operators (exact-substring dedup,
  * span decontamination, KMV overlap), checked over seeded random
  * corpora (failures replay deterministically). */
class Round12PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260815)

  /** Random corpus with planted cross-doc duplicate runs: base docs of
    * fresh tokens, then a shared `dupRun` spliced into some of them. */
  private def corpus(nDocs: Int, dupRunLen: Int): Seq[(Long, String)] = {
    val dupRun = (1 to dupRunLen).map(i => s"dup$i")
    (1L to nDocs.toLong).map { id =>
      val own = (1 to 8 + rnd.nextInt(20)).map(i => s"t${id}x$i")
      val toks =
        if (id % 2 == 0) {
          val cut = 1 + rnd.nextInt(own.size - 1)
          own.take(cut) ++ dupRun ++ own.drop(cut)
        } else own
      (id, toks.mkString(" "))
    }
  }

  test("stripDuplicateSpans conservation: kept + dropped == token count, clean_text == kept tokens") {
    for (trial <- 1 to 5) {
      val docs = corpus(6 + rnd.nextInt(10), 6 + rnd.nextInt(6))
      val df = docs.toDF("doc_id", "text")
      val out = Dedup.stripDuplicateSpans(df, "doc_id", "text", n = 4)
        .as[(Long, String, Long, Long)].collect()
      val orig = docs.toMap
      assert(out.length == docs.size)
      out.foreach { case (id, clean, kept, dropped) =>
        val total = orig(id).split(" ").length
        assert(kept + dropped == total, s"trial $trial doc $id")
        val cleanToks =
          if (clean.isEmpty) 0 else clean.split(" ").length
        assert(cleanToks == kept, s"trial $trial doc $id clean mismatch")
      }
    }
  }

  test("duplicateSpans soundness + maximality: spans in bounds, length >= n, non-overlapping, only on planted docs") {
    for (trial <- 1 to 5) {
      val runLen = 6 + rnd.nextInt(6)
      val docs = corpus(8 + rnd.nextInt(8), runLen)
      val df = docs.toDF("doc_id", "text")
      val spans = Dedup.duplicateSpans(df, "doc_id", "text", n = 4)
        .as[(Long, Long, Long, Long)].collect()
      val nToks = docs.toMap.map { case (id, t) =>
        id -> t.split(" ").length }
      // every planted doc (even ids) must carry at least one span that
      // covers the full planted run; odd docs must carry none
      val byDoc = spans.groupBy(_._1)
      docs.foreach { case (id, _) =>
        if (id % 2 == 0)
          assert(byDoc.contains(id), s"trial $trial doc $id missed")
        else
          assert(!byDoc.contains(id), s"trial $trial doc $id false pos")
      }
      spans.foreach { case (id, s, e, len) =>
        assert(s >= 0 && e <= nToks(id) && len == e - s && len >= 4,
          s"trial $trial bad span ($id,$s,$e)")
        // the planted run is length >= 6 with unique flanks, so every
        // span must contain at least runLen - overlap tokens of it
        assert(len >= runLen - 1, s"trial $trial span shorter than run")
      }
      // non-overlap + maximality within a doc: sorted spans are gapped
      byDoc.values.foreach { ss =>
        val sorted = ss.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array((_, _, e1, _), (_, s2, _, _)) =>
            assert(s2 > e1, s"trial $trial overlapping/adjacent spans")
          case _ => ()
        }
      }
    }
  }

  test("duplicateSpans monotone in minCount: covered positions shrink as minCount grows") {
    val docs = corpus(12, 8)
    val df = docs.toDF("doc_id", "text")
    def covered(minCount: Long): Set[(Long, Long)] =
      Dedup.duplicateSpans(df, "doc_id", "text", n = 4, minCount)
        .as[(Long, Long, Long, Long)].collect()
        .flatMap { case (id, s, e, _) => (s until e).map(id -> _) }
        .toSet
    val c2 = covered(2); val c3 = covered(3); val c5 = covered(5)
    assert(c3.subsetOf(c2) && c5.subsetOf(c3))
  }

  test("keepFirst drops strictly less than keep-none; one occurrence of the run survives") {
    val docs = corpus(10, 8)
    val df = docs.toDF("doc_id", "text")
    def dropped(keepFirst: Boolean): Long =
      Dedup.stripDuplicateSpans(df, "doc_id", "text", n = 4,
          minCount = 2L, keepFirst = keepFirst)
        .agg(sum("n_dropped")).as[Long].head
    val all = dropped(keepFirst = false)
    val first = dropped(keepFirst = true)
    assert(first < all, s"keepFirst=$first vs all=$all")
    // keepFirst leaves the first planted copy intact: the lowest even
    // doc id keeps its full token count
    val firstDoc = Dedup.stripDuplicateSpans(df, "doc_id", "text",
        n = 4, minCount = 2L, keepFirst = true)
      .filter(col("doc_id") === 2L).select("n_dropped").as[Long].head
    assert(firstDoc == 0L, "first occurrence was cut")
  }

  test("decontaminate: empty benchmark is identity; planted leak is cut; conservation holds") {
    val docs = corpus(10, 7)
    val df = docs.toDF("doc_id", "text")
    val emptyBench = Seq.empty[String].toDF("text")
    val id = Dedup.decontaminate(df, "doc_id", "text", emptyBench,
        "text", n = 4)
      .as[(Long, String, Long, Long)].collect()
    val orig = docs.toMap
    id.foreach { case (d, clean, _, dropped) =>
      assert(dropped == 0L && clean == orig(d), s"doc $d not identity")
    }
    // benchmark containing the planted run: every even doc loses >= the
    // run's windows, every odd doc is untouched
    val bench = Seq((1 to 7).map(i => s"dup$i").mkString(" ")).toDF("text")
    val out = Dedup.decontaminate(df, "doc_id", "text", bench, "text",
        n = 4)
      .as[(Long, String, Long, Long)].collect()
    out.foreach { case (d, clean, kept, dropped) =>
      val total = orig(d).split(" ").length
      assert(kept + dropped == total, s"doc $d conservation")
      if (d % 2 == 0) {
        assert(dropped >= 7L, s"doc $d leak survived")
        assert(!clean.contains("dup1 dup2 dup3 dup4"),
          s"doc $d still contains a benchmark window")
      } else assert(dropped == 0L, s"doc $d false cut")
    }
  }

  test("kmvSourceOverlap exact limits: identical sources -> 1.0, disjoint -> 0.0; row order irrelevant") {
    val shared = (1 to 60).map(i => (s"text piece $i alpha beta gamma " +
      s"delta $i"))
    val other = (1 to 60).map(i => s"completely different corpus $i " +
      s"epsilon zeta eta $i")
    val df = (shared.map(("s1", _)) ++ shared.map(("s2", _)) ++
        other.map(("s3", _))).toDF("source", "text")
    val got = Dedup.kmvSourceOverlap(df, "source", "text", n = 3, k = 32)
      .select("src_a", "src_b", "kmv_jaccard")
      .as[(String, String, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(got(("s1", "s2")) == 1.0)
    assert(got(("s1", "s3")) == 0.0 && got(("s2", "s3")) == 0.0)
    // permutation invariance: shuffled row order yields the same table
    val shuffled = new Random(7).shuffle(
        shared.map(("s1", _)) ++ shared.map(("s2", _)) ++
          other.map(("s3", _)))
      .toDF("source", "text").repartition(7)
    val got2 = Dedup.kmvSourceOverlap(shuffled, "source", "text",
        n = 3, k = 32)
      .select("src_a", "src_b", "kmv_jaccard")
      .as[(String, String, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(got2 == got)
  }
}
