package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Training-data operators: text analysis, dedup family, similarity. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, v: String): T =
    Seq(Option(v)).toDF("t").select(c.as("v")).head().getAs[T](0)

  test("token count: whitespace runs, blanks, null") {
    assert(one[Int](TextOps.tokenCount(col("t")), "a  b\tc\nd") == 4)
    assert(one[Int](TextOps.tokenCount(col("t")), "   ") == 0)
    assert(one[Int](TextOps.tokenCount(col("t")), null) == 0)
  }

  test("bpe-ish count: ~4 chars per piece + punctuation") {
    // "hello world!" -> ceil(5/4)+ceil(5/4) + 1 punct = 2+2+1
    assert(one[Long](TextOps.bpeishTokenCount(col("t")), "hello world!") == 5L)
  }

  test("quality metrics on a known string") {
    val m = Seq("The cat, the DOG 42.").toDF("t")
      .select(TextOps.qualityColumns(col("t")).map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(m.getAs[Int]("n_chars") == 20)
    assert(m.getAs[Int]("n_tokens") == 5)
    // tokens: The/cat,/the/DOG/42. -> lens 3,4,3,3,3 = 16/5
    assert(m.getAs[Double]("mean_token_len") == 3.2)
    assert(m.getAs[Double]("punct_ratio") == 0.1)       // "," "." / 20
    assert(m.getAs[Double]("digit_ratio") == 0.1)       // "42" / 20
    assert(m.getAs[Double]("upper_ratio") == 0.2)       // T,D,O,G / 20
    assert(m.getAs[Double]("stopword_ratio") == 0.4)    // The,the / 5
  }

  test("language id picks dominant function words; und; zh") {
    def lang(s: String) = one[String](TextOps.langId(col("t")), s)
    assert(lang("the cat and the dog is in that house for it was") == "en")
    assert(lang("el perro y la casa de que en un una es por") == "es")
    assert(lang("der Hund und die Katze ist nicht mit ein von") == "de")
    assert(lang("le chat est dans les des pour une du") == "fr")
    assert(lang("xyzzy plugh") == "und")
    assert(lang("你好世界") == "zh")
  }

  test("fingerprint invariant to case/punct/whitespace") {
    def fp(s: String) = one[String](TextOps.fingerprint(col("t")), s)
    assert(fp("Hello, World!") == fp("hello   world"))
    assert(fp("Hello, World!") != fp("goodbye world"))
  }

  test("rolling hash column matches scala twin") {
    val h = one[Long](TextOps.rollingHash(col("t")), "Hello, World!")
    assert(h == TextOps.rollingHashScala("hello world"))
  }

  test("repetition signals on known strings") {
    def rep(s: String) = TextOps.repetitionSignals(
      Seq((1L, Option(s))).toDF("id", "t"), "id", "t").head()
    val m = rep("a a b") // tokens [a,a,b]; bigrams ["a a","a b"]
    assert(m.getAs[Long]("n_tokens") == 3L)
    assert(m.getAs[Double]("dup_token_frac") == 0.333333) // (3-2)/3
    assert(m.getAs[Double]("top_token_frac") == 0.666667) // "a" 2/3
    assert(m.getAs[Double]("dup_bigram_frac") == 0.0)
    val x = rep("x x x") // bigrams ["x x","x x"] -> 1 dup of 2
    assert(x.getAs[Double]("dup_bigram_frac") == 0.5)
    assert(x.getAs[Double]("top_token_frac") == 1.0)
    val e = rep(null) // no tokens: every signal 0, no null leaks
    assert(e.getAs[Long]("n_tokens") == 0L)
    assert(e.getAs[Double]("dup_token_frac") == 0.0)
    assert(e.getAs[Double]("top_token_frac") == 0.0)
  }

  test("vocab coverage: OOV rate against top-k corpus vocabulary") {
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "x"), (4L, null))
      .toDF("id", "t")
    // df: a->2 docs, b/c/x->1; top-1 vocabulary = {a}
    val got = TextOps.vocabCoverage(docs, "id", "t", topK = 1)
      .select("id", "n_tokens", "n_in_vocab", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, 3L, 2L, 0.333333), (2L, 2L, 1L, 0.5),
      (3L, 1L, 0L, 1.0), (4L, 0L, 0L, 0.0)))
  }

  test("pii scrub: emails and phones redacted and counted") {
    val r = Seq("mail a@b.co or b.c@d.org, call +91 555-0042 now")
      .toDF("t")
      .select(TextOps.piiScrub(col("t")).as("s") +:
        TextOps.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(r.getAs[String]("s") ==
      "mail <EMAIL> or <EMAIL>, call <PHONE> now")
    assert(r.getAs[Long]("n_emails") == 2L)
    assert(r.getAs[Long]("n_phones") == 1L)
  }

  test("collocations: rational PMI over adjacent bigrams, minCount floor, tie order") {
    val docs = Seq("the quick fox", "the quick dog", "the quick fox",
      "", null).toDF("text")
    val got = TextOps.collocations(docs, "text", minCount = 2, k = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    // N=9; uni: the=3 quick=3 fox=2 dog=1; "the quick"=3, "quick fox"=2
    // ("quick dog"=1 floored out). PMI: 3·9/9 = 3.0 and 2·9/6 = 3.0 —
    // score tie breaks on (term_a, term_b): "quick fox" < "the quick"
    assert(got == Seq(("quick", "fox", 2L, 3.0), ("the", "quick", 3L, 3.0)))
  }

  test("collocations: empty corpus yields empty frame") {
    val docs = Seq.empty[String].toDF("text")
    assert(TextOps.collocations(docs, "text").count() == 0)
  }

  test("bpeTrain learns the classic merge sequence on the textbook corpus") {
    // low×5, lower×2, newest×6, widest×3 — the standard BPE example.
    // Hand-computed with the (count desc, left, right) tie rule:
    //   step1 (e,s) 9 [ties (s,t) 9, 'e' < 's' wins]
    //   step2 (es,t) 9
    //   step3 (l,o) 7 [ties (o,w) 7]
    //   step4 (lo,w) 7
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .map(w => s"$w").toDF("text")
    val got = TextOps.bpeTrain(corpus, "text", merges = 4)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L),
      (4L, "lo", "w", "low", 7L)))
  }

  test("bpeTrain: merge application is two-pass leftmost (abab merges fully)") {
    val corpus = Seq("abab").toDF("text")
    val got = TextOps.bpeTrain(corpus, "text", merges = 2)
      .as[(Long, String, String, String, Long)].collect().toSeq
    // step1: pairs (a,b)=2, (b,a)=1 → merge ab; two-pass replace turns
    // "a b a b" into "ab ab" (single-pass would strand the second pair)
    assert(got.head == ((1L, "a", "b", "ab", 2L)))
    // step2 must therefore see (ab,ab)=1 as the only remaining pair
    assert(got(1) == ((2L, "ab", "ab", "abab", 1L)))
  }

  test("bpeEncodeStats applies learned merges: subword counts match hand-encoding") {
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("text")
    val merges = TextOps.bpeTrain(corpus, "text", merges = 4)
      .orderBy("step").as[(Long, String, String, String, Long)]
      .collect().map(t => (t._2, t._3)).toSeq
    val docs = Seq((1L, "low"), (2L, "lower"), (3L, "newest"),
      (4L, "widest"), (5L, "low lower")).toDF("id", "t")
    val got = TextOps.bpeEncodeStats(docs, "id", "t", merges)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3))
      .toMap
    // merges: es, est, lo, low → low=[low]=1, lower=[low,e,r]=3,
    // newest=[n,e,w,est]=4, widest=[w,i,d,est]=4
    assert(got == Map(1L -> (1L, 1L), 2L -> (1L, 3L), 3L -> (1L, 4L),
      4L -> (1L, 4L), 5L -> (2L, 4L)))
  }

  test("templateGroups: same line-length skeleton groups; different text, same slots") {
    val docs = Seq(
      (1L, "Title A\nBody text here\nfooter"),   // lengths 7,14,6
      (2L, "Title B\nWords are here\nFOOTER"),   // lengths 7,14,6 — same
      (3L, "Completely different\nshape"),
      (4L, "x")).toDF("doc_id", "text")
    val got = TextOps.templateGroups(docs, "doc_id", "text")
      .select("doc_id", "n_docs").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L))
  }

  test("lengthOutliers: exact discrete bounds, degenerate single-row group") {
    val rows = ((1 to 100).map(i => ("a", i.toLong, i.toLong)) :+
      ("b", 200L, 7L)).toDF("src", "id", "v")
    val got = TextOps.lengthOutliers(rows, Seq("src"), "id", "v",
      pLo = 0.05, pHi = 0.95)
    val a = got.filter(col("src") === "a")
      .select("p_lo", "p_hi").distinct().as[(Long, Long)].collect().toSeq
    // ceil(0.05*100)=5th value = 5; ceil(0.95*100)=95th = 95
    assert(a == Seq((5L, 95L)))
    val aOut = got.filter(col("src") === "a" && col("is_outlier"))
      .select("v").as[Long].collect().sorted.toSeq
    assert(aOut == ((1L to 4L) ++ (96L to 100L)))
    // single-row group: its own value is both bounds — never an outlier
    val b = got.filter(col("src") === "b")
      .select("p_lo", "p_hi", "is_outlier")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(b == Seq((7L, 7L, false)))
  }

  test("c4Clean: line rules, page flags, degenerate docs") {
    val docs = Seq(
      // 6 good lines (5 sentence terminators — the quote line adds
      // none) → all kept, page kept
      (1L, "one two three.\nfour five six!\nseven eight nine?\n" +
        "ten eleven twelve.\nthe quote line ends \"\nlast good line."),
      // line filters: no terminal punct / short / javascript mention
      (2L, "no terminal punct here\nok.\nenable javascript to view this.\n" +
        "tiny."),
      (3L, "lorem ipsum dolor sit amet. " * 6), // raw-page lorem flag
      (4L, "var x = { a: 1 }. " * 6), // raw-page brace flag
      (5L, ""), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.c4Clean(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(got(1L)._3 == 6L && got(1L)._4 == 5L && got(1L)._5,
      s"all six lines keep, five sentences, page keeps: ${got(1L)}")
    // doc 2: only "ok." fails minWords(3); "enable javascript…" fails the
    // javascript rule; "no terminal punct here" fails punct; "tiny." short
    assert(got(2L)._1 == "" && got(2L)._3 == 0L && !got(2L)._5)
    assert(!got(3L)._5 && !got(4L)._5, "lorem/brace pages drop")
    assert(got(5L) == (("", 1L, 0L, 0L, false)))
    assert(got(6L) == (("", 1L, 0L, 0L, false)))
  }

  test("profileColumns: nulls, distinct, min/max per column in one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10)), (2L, None, Some(10)),
      (3L, Some("c"), None), (4L, Some("a"), Some(30)))
      .toDF("id", "s", "v")
    val got = CorpusStats.profileColumns(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s") == ((4L, 1L, 2L, "a", "c")))
    assert(got("v") == ((4L, 1L, 2L, "10", "30")))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "The quick brown fox jumps over the lazy dog"), // exact mod case
    (4L, "completely different text about spark engines here"),
    (5L, "")).toDF("doc_id", "text")

  test("exact dedup groups case-normalized duplicates") {
    val d = Dedup.exact(
      docs.withColumn("fp", TextOps.fingerprint(col("text"))),
      Seq("fp"), "doc_id")
    val m = d.select("doc_id", "dup_count").as[(Long, Long)].collect().toMap
    assert(m(1L) == 2L) // docs 1 and 3 collapse, min id 1 survives
    assert(Dedup.exactKeep(docs.withColumn("fp",
      TextOps.fingerprint(col("text"))), Seq("fp"), "doc_id")
      .count() == 4)
  }

  test("exactKeep keeps one row per null-key group (null-safe semi join)") {
    val df = Seq((1L, Option("x")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("id", "k")
    val kept = Dedup.exactKeep(df, Seq("k"), "id")
      .select("id").as[Long].collect().toSet
    // a null-unsafe join would drop ids 2 and 3 entirely
    assert(kept == Set(1L, 2L))
  }

  test("containment catches doc-inside-doc that jaccard dilutes") {
    // doc 11 is fully contained in the much longer doc 10
    val d = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (11L, "alpha beta gamma delta epsilon"),
      (12L, "unrelated words entirely about something else altogether"))
      .toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(d, "doc_id", "text", n = 3,
      threshold = 0.9).as[(Long, Long, Double)].collect().toSeq
    assert(cont.map(p => (p._1, p._2)) == Seq((10L, 11L)))
    assert(cont.head._3 == 1.0, "full containment scores exactly 1.0")
    // jaccard misses the same pair at any comparable threshold:
    // |A∩B| = 3 shingles, |A∪B| = 18 → 0.1667
    val jac = Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3,
      threshold = 0.5).count()
    assert(jac == 0)
  }

  test("sourceOverlap: identical sources score 1.0, disjoint absent") {
    val d = Seq(
      ("crawl_a", "one two three four five six"),
      ("crawl_b", "one two three four five six"), // same shingles as a
      ("crawl_c", "seven eight nine ten eleven twelve"))
      .toDF("source", "text")
    val got = Dedup.sourceOverlap(d, "source", "text", n = 3)
      .select("src_a", "src_b", "overlap")
      .as[(String, String, Double)].collect().toSeq
    assert(got == Seq(("crawl_a", "crawl_b", 1.0)),
      "only the identical pair shares any shingle")
  }

  test("editVerifiedPairs: exact edit check prunes LSH candidates") {
    // candidates at est>=0.3: (1,2) dog/cat, (1,3) case-only, (2,3).
    // raw-text edit sims: 1-3 ≈ 0.977 (one char), 1-2 ≈ 0.93 (3 chars),
    // 2-3 ≈ 0.907 — a 0.95 floor keeps exactly the case-only pair
    val strict = Dedup.editVerifiedPairs(docs, "doc_id", "text",
      estThreshold = 0.3, minEditSim = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(strict == Set((1L, 3L)))
    val loose = Dedup.editVerifiedPairs(docs, "doc_id", "text",
      estThreshold = 0.3, minEditSim = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(loose == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // verified pairs carry the candidate stage's estimate unchanged
    val cand = Dedup.minHashCandidatesPortable(docs, "doc_id", "text",
      estThreshold = 0.3)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val verified = Dedup.editVerifiedPairs(docs, "doc_id", "text",
      estThreshold = 0.3, minEditSim = 0.9)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(verified.subsetOf(cand))
  }

  test("editVerifiedPairs clamps to maxChars before the distance") {
    // same first 8 chars, divergent tails: clamped prefixes are equal,
    // so the pair verifies at similarity exactly 1.0
    val d = Seq(
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "aa bb cc dd ee ff gg zz")).toDF("doc_id", "text")
    val got = Dedup.editVerifiedPairs(d, "doc_id", "text",
      estThreshold = 0.3, minEditSim = 0.99, maxChars = 8)
      .select("id_a", "id_b", "edit_sim")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1.0)))
    // full texts differ (distance 2 of 23) — without the clamp the same
    // floor rejects the pair, proving the distance ran on the prefix
    assert(Dedup.editVerifiedPairs(d, "doc_id", "text",
      estThreshold = 0.3, minEditSim = 0.99).count() == 0)
  }

  test("banding rejects non-dividing band counts (degenerate cross join)") {
    intercept[IllegalArgumentException] {
      Dedup.lshBandKeys(col("sig"), bands = 7, numHashes = 64)
    }
    intercept[IllegalArgumentException] {
      Similarity.cosineDupPairs(
        Seq((1L, Array(1.0f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", 0.5, numPlanes = 16, bands = 32)
    }
  }

  test("shingles: distinct n-grams, short text empty") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).contains("the quick brown"))
    assert(sh(1L).length == 7) // 9 words -> 7 trigrams, all distinct
    assert(sh(5L).isEmpty)
  }

  test("ngram jaccard finds the near-dup pair") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L))) // identical after normalization
    assert(pairs.contains((1L, 2L)) || {
      // 1-2 share 6 of 8 union trigrams = 0.75
      val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .filter(col("id_a") === 1 && col("id_b") === 2)
        .select("jaccard").as[Double].collect()
      j.nonEmpty && j.head > 0.5
    })
  }

  test("minhash LSH: identical docs always candidates, est_jaccard 1.0") {
    val out = Dedup.minHashCandidates(docs, "doc_id", "text",
      n = 3, numHashes = 32, bands = 8, estThreshold = 0.0)
      .as[(Long, Long, Double)].collect()
    val exact = out.find(r => r._1 == 1L && r._2 == 3L)
    assert(exact.isDefined && exact.get._3 == 1.0)
    // near-dup 1-2 should be a candidate with high estimate
    val near = out.find(r => r._1 == 1L && r._2 == 2L)
    assert(near.isDefined && near.get._3 > 0.4)
  }

  test("removeRepeatedSpans scrubs shared spans, keeps the unique tail") {
    val out = Dedup.removeRepeatedSpans(docs, "doc_id", "text",
      n = 3, minDf = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // docs 1 and 3 normalize identically: every trigram df>=2, all gone
    assert(out(1L) == (("", 9L, 9L)))
    assert(out(3L) == (("", 9L, 9L)))
    // doc 2 shares trigrams covering positions 0..7; "cat" survives
    assert(out(2L) == (("cat", 9L, 8L)))
    // unique doc untouched; empty doc comes back empty
    assert(out(4L)._1.nonEmpty &&
      out(4L)._2 == out(4L)._1.split(" ").length.toLong &&
      out(4L)._3 == 0L)
    assert(out(5L) == (("", 0L, 0L)))
  }

  test("minhash incremental vs stored signatures == batch-mode restricted") {
    // corpus = ids 1-3, batch = ids 4-6 (6 near-dups 1; 5 dups 4 exactly)
    val all = docs.filter(length(col("text")) > 0).union(Seq(
      (6L, "the quick brown fox jumps over the lazy dogs"),
      (5L, "completely different text about spark engines here"))
      .toDF("doc_id", "text"))
    val corpus = all.filter(col("doc_id") <= 3)
    val batch = all.filter(col("doc_id") > 3)
    val stored = Dedup.minHashSignaturesPortable(corpus, "doc_id", "text",
      n = 3, numHashes = 32)
    val incr = Dedup.minHashIncrementalPortable(batch, "doc_id", "text",
      stored, n = 3, numHashes = 32, bands = 8, estThreshold = 0.0)
      .as[(Long, Long, Double)].collect().toSet
    val batchMode = Dedup.minHashCandidatesPortable(all, "doc_id", "text",
      n = 3, numHashes = 32, bands = 8, estThreshold = 0.0)
      .as[(Long, Long, Double)].collect().toSet
      .filter(_._2 > 3) // pairs touching a new doc (id_b = max)
    assert(incr == batchMode, s"incr=$incr batch=$batchMode")
    // the exact-duplicate cross pair is present with estimate 1.0
    assert(incr.exists(p => p._1 == 4L && p._2 == 5L && p._3 == 1.0))
  }

  test("simhash: identical docs hamming 0; unrelated docs far") {
    val sigs = docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), Dedup.simHash(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(3L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) > 10)
    val cands = Dedup.simHashCandidates(docs, "doc_id", "text",
      chunks = 4, maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 3L)))
  }

  test("incremental dedup: batch-first AND corpus-unseen keys survive") {
    val corpus = Seq("k1", "k2").toDF("fp")
    val batch = Seq(
      (10L, "k2"), // already in corpus -> dropped
      (11L, "k3"), // new -> survives
      (12L, "k3"), // batch-internal dup -> dropped (11 is first)
      (13L, "k4")  // new -> survives
    ).toDF("doc_id", "fp")
    val out = Dedup.incremental(batch, corpus, Seq("fp"), "doc_id")
      .select("doc_id", "fp").as[(Long, String)].collect().toSet
    assert(out == Set((11L, "k3"), (13L, "k4")))
  }

  test("clusters: transitive closure of the pair graph, min-id canonical") {
    // chain 1-2, 2-3 (1 and 3 never directly compared) + isolated 4, 5
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.clusters(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
    // empty pair set: everyone is their own cluster
    val alone = Dedup.clusters(ids, "doc_id",
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(alone.forall { case (k, v) => k == v })
  }

  test("topKeywords: rare terms outrank common ones; deterministic ties") {
    val corpus = Seq(
      (1L, "alpha alpha shared shared shared"),
      (2L, "beta shared shared"),
      (3L, "gamma shared")).toDF("doc_id", "text")
    val kw = TextOps.topKeywords(corpus, "doc_id", "text", k = 1)
      .select("id", "term").as[(Long, String)].collect().toMap
    // "shared" has df=3; each doc's unique term (df=1) scores higher
    assert(kw == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
    val ranks = TextOps.topKeywords(corpus, "doc_id", "text", k = 2)
      .select("id", "term", "rank").as[(Long, String, Long)].collect().toSet
    assert(ranks.contains((1L, "shared", 2L)))
  }

  test("paragraph dedup: global first occurrence wins, docs reassemble in order") {
    import spark.implicits._
    val sep = "\n\n"
    val docs = Seq(
      (1L, s"alpha one${sep}shared footer${sep}alpha two"),
      (2L, s"beta one${sep}shared footer${sep}beta two"),
      // doc 3 repeats ITS OWN paragraph and doc 1's opener
      (3L, s"alpha one${sep}gamma${sep}gamma"),
      (4L, s"shared footer")) // loses everything
      .toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text", sep)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((s"alpha one${sep}shared footer${sep}alpha two", 3L, 0L)))
    assert(out(2L) == ((s"beta one${sep}beta two", 2L, 1L)))
    // within-doc duplicate also collapses to the first occurrence
    assert(out(3L) == ((s"gamma", 1L, 2L)))
    assert(out(4L) == (("", 0L, 1L)))
  }

  test("duplicateSpans: cross-doc + within-doc windows merge into maximal spans") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat today"), // windows 0,1 shared with doc 2
      (2L, "yesterday the cat sat on a rug"), // windows 1,2 shared with doc 1
      (3L, "totally unique words here only now"), // no duplicate windows
      (4L, "x y z w x y z")) // within-doc repeat of 'x y z' at 0 and 4
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // doc 1: dup windows at s=0 ('the cat sat') and s=1 ('cat sat on')
    // overlap → ONE span [0,4); doc 2 the same content at s=1,2 → [1,5);
    // doc 4: 'x y z' at s=0 and s=4, gap at 3 → TWO spans [0,3) [4,7)
    assert(got == Set(
      (1L, 0L, 4L, 4L), (2L, 1L, 5L, 4L),
      (4L, 0L, 3L, 3L), (4L, 4L, 7L, 3L)), got.toString)
  }

  test("duplicateSpans: contiguous (non-overlapping) windows merge too") {
    import spark.implicits._
    // 'a b c' (s=0) and 'd e f' (s=3) both duplicated: spans [0,3) and
    // [3,6) touch → the island rule (new span only when s > running
    // end) merges them into [0,6), the union either way
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c q q q"), (3L, "q d e f q q"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", n = 3)
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 6L)), got.toString)
  }

  test("duplicateSpans keepFirst: globally first occurrence survives, later copies marked") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat today"),
      (2L, "yesterday the cat sat on a rug"),
      (4L, "x y z w x y z")).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", n = 3,
        keepFirst = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 wrote every shared window first (smaller doc id) → unmarked;
    // doc 2's copies at s=1,2 merge to [1,5); doc 4's second 'x y z'
    // (s=4) is marked, the s=0 original survives
    assert(got == Set((2L, 1L, 5L), (4L, 4L, 7L)), got.toString)
    val stripped = Dedup.stripDuplicateSpans(docs, "doc_id", "text",
        n = 3, keepFirst = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stripped(1L) == "the cat sat on the mat today") // untouched
    assert(stripped(2L) == "yesterday a rug")
    assert(stripped(4L) == "x y z w")
  }

  test("stripDuplicateSpans cuts the span, keeps the unique remainder") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat today"),
      (2L, "yesterday the cat sat on a rug"),
      (3L, "totally unique words here only now"),
      (4L, "x y z w x y z")).toDF("doc_id", "text")
    val got = Dedup.stripDuplicateSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("the mat today", 3L, 4L)))
    assert(got(2L) == (("yesterday a rug", 3L, 4L)))
    assert(got(3L) == (("totally unique words here only now", 6L, 0L)))
    assert(got(4L) == (("w", 1L, 6L))) // both 'x y z' copies cut
  }

  test("decontaminate cuts benchmark-colliding spans, not documents") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "intro words then the secret eval answer is here plus more context"),
      (2L, "clean document with no overlap at all")).toDF("doc_id", "text")
    val bench = Seq("the secret eval answer is here").toDF("btext")
    // n=4: doc 1's windows at s=3,4,5 match benchmark windows → one
    // merged span [3,9); the document SURVIVES minus the leaked span
    val spans = Dedup.decontaminateSpans(corpus, "doc_id", "text",
        bench, "btext", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((1L, 3L, 9L)), spans.toString)
    val got = Dedup.decontaminate(corpus, "doc_id", "text",
        bench, "btext", n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("intro words then plus more context", 6L, 6L)))
    assert(got(2L) == (("clean document with no overlap at all", 7L, 0L)))
  }

  test("frequent-paragraph strip drops every copy past the cap, keeps the rest") {
    import spark.implicits._
    val sep = "\n\n"
    // 'footer' appears 3× (> maxFreq=2) → vanishes everywhere;
    // 'gamma' appears 2× (= cap) → survives BOTH times
    val docs = Seq(
      (1L, s"alpha${sep}footer${sep}gamma"),
      (2L, s"beta${sep}footer${sep}gamma"),
      (3L, s"footer")).toDF("doc_id", "text")
    val out = Dedup.stripFrequentParagraphs(docs, "doc_id", "text", sep,
      maxFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((s"alpha${sep}gamma", 2L, 1L)))
    assert(out(2L) == ((s"beta${sep}gamma", 2L, 1L)))
    assert(out(3L) == (("", 0L, 1L)))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f)),
    (4L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("cosine: orthogonal 0, identical 1, opposite -1") {
    val c = vecs.as("a").join(vecs.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(c((0L, 4L)) - 1.0) < 1e-9)
    assert(math.abs(c((0L, 2L))) < 1e-9)
    assert(math.abs(c((0L, 3L)) + 1.0) < 1e-9)
  }

  test("brute-force top-k order and tie-break") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      Array(1.0, 0.0, 0.0), 3).select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(0L, 4L, 1L)) // ties 0,4 broken by id
  }

  test("top-k plan is TakeOrdered, not a global sort") {
    val plan = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      Array(1.0, 0.0, 0.0), 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hyperplane signature: equal vectors share bucket; lshTopK finds them") {
    val sig = vecs.select(col("vec_id"),
      Similarity.hyperplaneSignature(col("embedding"), 12).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sig(0L) == sig(4L))
    val top = Similarity.lshTopK(vecs, "vec_id", "embedding",
      Array(1.0, 0.0, 0.0), 2, numPlanes = 12, probeBits = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(top.headOption.contains(0L))
  }

  test("cosineDupPairs finds the identical pair") {
    val pairs = Similarity.cosineDupPairs(vecs, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 4L)))
  }

  test("bruteForcePairs: baseline contains LSH pairs, refuses big inputs") {
    val brute = Similarity.bruteForcePairs(vecs, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.contains((0L, 4L)))
    // every LSH-verified pair must be an exact pair at the same threshold
    val lsh = Similarity.cosineDupPairs(vecs, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
    // the O(n²) gate: fail fast instead of silently going cartesian
    intercept[IllegalArgumentException] {
      Similarity.bruteForcePairs(vecs, "vec_id", "embedding", 0.99, maxRows = 3)
    }
  }
}
