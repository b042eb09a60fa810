package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gopher quality rules, per-domain corpus stats, JL random projection. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def signals(text: String, minWords: Int = 3) =
    Seq(Option(text)).toDF("t")
      .select(TextOps.gopherColumns(col("t"), minWords = minWords,
        minStopHits = 1).map { case (n, c) => c.as(n) }: _*)
      .head()

  test("word stats and keep on a clean sentence") {
    val m = signals("the quick brown fox jumps over that lazy dog")
    assert(m.getAs[Long]("n_words") == 9L)
    // lens 3,5,5,3,5,4,4,4,3 = 36/9
    assert(m.getAs[Double]("mean_word_len") == 4.0)
    assert(m.getAs[Double]("alpha_word_frac") == 1.0)
    assert(m.getAs[Long]("stop_hits") == 2L) // the, that (distinct hits)
    assert(m.getAs[Double]("symbol_ratio") == 0.0)
    assert(m.getAs[Long]("keep") == 1L)
  }

  test("distinct stopword hits, not occurrences") {
    // 'the' repeated: still one distinct hit -> fails minStopHits=2 default
    val m = Seq("the the the the").toDF("t")
      .select(TextOps.gopherColumns(col("t"), minWords = 2)
        .map { case (n, c) => c.as(n) }: _*).head()
    assert(m.getAs[Long]("stop_hits") == 1L)
    assert(m.getAs[Long]("keep") == 0L)
  }

  test("symbol ratio counts '#' chars and ellipses; gates keep") {
    val m = signals("the code ## snippet that trails ... off … now")
    assert(m.getAs[Long]("n_words") == 10L)
    // 2 '#' + '...' + unicode ellipsis = 4 symbols / 10 words
    assert(m.getAs[Double]("symbol_ratio") == 0.4)
    assert(m.getAs[Long]("keep") == 0L)
  }

  test("non-alphabetic words drop alpha_word_frac below the gate") {
    val m = signals("the 12 34 56 78 90")
    assert(m.getAs[Double]("alpha_word_frac") ==
      math.rint(1.0 / 6 * 1e6) / 1e6)
    assert(m.getAs[Long]("keep") == 0L)
  }

  test("null and blank text: zero rows of signal, not NaN") {
    for (t <- Seq(null, "   ")) {
      val m = signals(t)
      assert(m.getAs[Long]("n_words") == 0L)
      assert(m.getAs[Double]("mean_word_len") == 0.0)
      assert(m.getAs[Double]("alpha_word_frac") == 0.0)
      assert(m.getAs[Long]("keep") == 0L)
    }
  }
}

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("per-domain counts, dup rate, token totals") {
    val df = Seq(
      ("a", "x y z"), ("a", "x  y Z"), ("a", "unique words here"),
      ("b", "p q"), ("b", "p q")
    ).toDF("source", "text")
    val got = CorpusStats.domainStats(df, "source", "text")
      .orderBy("domain").collect()
    // domain a: 3 docs, fingerprints of "x y z" == "x  y Z" (casefold +
    // whitespace collapse) -> 2 unique
    assert(got(0).getAs[String]("domain") == "a")
    assert(got(0).getAs[Long]("n_docs") == 3L)
    assert(got(0).getAs[Long]("n_unique") == 2L)
    assert(got(0).getAs[Double]("dup_rate") == math.rint((1 - 2.0 / 3) * 1e6) / 1e6)
    assert(got(0).getAs[Long]("total_tokens") == 9L)
    assert(got(0).getAs[Double]("mean_doc_tokens") == 3.0)
    assert(got(1).getAs[Long]("n_docs") == 2L)
    assert(got(1).getAs[Long]("n_unique") == 1L)
    assert(got(1).getAs[Double]("dup_rate") == 0.5)
  }

  test("approx domain stats track exact within the HLL error bound") {
    val docs = (1 to 400).map(i =>
      ("web", s"document number ${i % 120} content words here"))
      .toDF("source", "text") // 120 distinct fingerprints, 400 docs
    val exact = CorpusStats.domainStats(docs, "source", "text").head()
    val approx = CorpusStats
      .domainStatsApprox(docs, "source", "text", rsd = 0.05).head()
    assert(approx.getAs[Long]("n_docs") == exact.getAs[Long]("n_docs"))
    assert(approx.getAs[Long]("total_tokens") ==
      exact.getAs[Long]("total_tokens"))
    val e = exact.getAs[Long]("n_unique").toDouble
    val a = approx.getAs[Long]("n_unique").toDouble
    assert(math.abs(a - e) / e <= 0.15, s"approx=$a exact=$e") // 3x rsd
    assert(approx.getAs[Double]("dup_rate") >= 0.0)
    // the shuffle carries HLL sketch partials, not fingerprint sets: the
    // plan must contain NO Expand/second aggregate for distinct
    val plan = CorpusStats.domainStatsApprox(docs, "source", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
  }

  test("null text counts as zero tokens and one fingerprint class") {
    val df = Seq(("d", null: String), ("d", ""), ("d", "w")).toDF("source", "text")
    val got = CorpusStats.domainStats(df, "source", "text").head()
    assert(got.getAs[Long]("n_docs") == 3L)
    assert(got.getAs[Long]("n_unique") == 2L) // "" and null collapse
    assert(got.getAs[Long]("total_tokens") == 1L)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val o = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "fp")
    val n = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("id", "fp")
    val got = CorpusStats.snapshotDiff(o, n, "id", "fp")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("heavyKeys: top-k by count, exact share, tie-break on key") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(2)("warm") ++
      Seq.fill(2)("also") ++ Seq("cold")).toDF("k")
    val got = CorpusStats.heavyKeys(df, Seq("k"), k = 3)
      .as[(String, Long, Double)].collect().toSeq
    // 11 rows total; counts 6,2,2,1 — tie between also/warm on key asc
    assert(got == Seq(("hot", 6L, 0.545455), ("also", 2L, 0.181818),
      ("warm", 2L, 0.181818)))
  }

  test("histogramDrift: identical halves zero drift; shifted bucket scores") {
    val a = Seq(0L, 0L, 1L, 2L).toDF("bucket")
    val same = CorpusStats.histogramDrift(a, a, "bucket")
      .select("drift").as[Double].collect().toSeq
    assert(same.forall(_ == 0.0))
    val b = Seq(0L, 1L, 1L, 3L).toDF("bucket")
    val got = CorpusStats.histogramDrift(a, b, "bucket")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // bucket 2 only in a: p=0.25 q=0 → drift 0.25; bucket 3 mirror
    assert(got(2L)._6 == 0.25 && got(3L)._6 == 0.25)
    // bucket 0: p=0.5 q=0.25 → (0.25)²/0.75 = 0.083333
    assert(got(0L)._6 == 0.083333)
    assert(got(1L)._6 == 0.083333)
  }
}

class RandomProjectSpec extends SparkSpec {
  import spark.implicits._

  private def sign(i: Int, j: Int): Double =
    if (((i.toLong * 73856093L + j.toLong * 19349663L) % 97) % 2 == 0) 1.0
    else -1.0

  test("projection matches the driver-side sign fold") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(-0.5f, 0.25f, 0.0f, 8.0f)))
    val got = Similarity.randomProject(vecs.toDF("id", "v"), "id", "v", 3)
      .orderBy("id").collect()
    for ((r, (_, v)) <- got.zip(vecs); j <- 0 until 3) {
      val expect = v.zipWithIndex
        .map { case (x, i) => BigDecimal(x.toDouble)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP) * sign(i, j) }.sum
      assert(r.getAs[Double](s"p$j") == expect.toDouble,
        s"id=${r.getLong(0)} j=$j")
    }
  }

  test("projection preserves exact duplicates and separates non-dups") {
    val df = Seq(
      (1L, Array.fill(8)(0.7f)), (2L, Array.fill(8)(0.7f)),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)))
    .toDF("id", "v")
    val rows = Similarity.randomProject(df, "id", "v", 4)
      .orderBy("id").collect()
    assert(rows(0).toSeq.drop(1) == rows(1).toSeq.drop(1))
    assert(rows(0).toSeq.drop(1) != rows(2).toSeq.drop(1))
  }

  test("null and empty vectors are absent from the projection") {
    val df = Seq((1L, Array(1.0f)), (2L, Array.empty[Float]),
      (3L, null: Array[Float])).toDF("id", "v")
    assert(col1[Long](Similarity.randomProject(df, "id", "v", 2)
      .select("id")) == Seq(1L))
  }
}

class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  // two axis-separated cells; within cell 1 the neighbor order of id=1 is
  // known: 2 (identical, cos 1) then 3 (tilted) — id 10 is in the other
  // cell and must never appear as a neighbor of 1
  private val df = Seq(
    (1L, Array(10f, 0f, 0f)), (2L, Array(10f, 0f, 0f)),
    (3L, Array(10f, 3f, 0f)), (4L, Array(10f, 0f, 8f)),
    (10L, Array(0f, 10f, 0f)), (11L, Array(0f, 10f, 1f))
  ).toDF("vec_id", "embedding")

  private val model = Ivf.Model(Array(
    Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)))

  test("per-node top-k within the cell, ranked by cosine then id") {
    val got = Similarity.knnGraph(df, "vec_id", "embedding", model, k = 2)
      .select("id", "nbr", "rank").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(got(1L) == Seq(2L, 3L)) // exact dup first, tilt second
    assert(got(2L) == Seq(1L, 3L)) // symmetric, tie on cos -> lower id
    assert(got(10L) == Seq(11L))   // other cell: only its own members
    assert(got(11L) == Seq(10L))
    // k caps the degree even in the dense cell
    assert(Similarity.knnGraph(df, "vec_id", "embedding", model, k = 1)
      .groupBy("id").count().select(max("count")).head().getLong(0) == 1L)
  }

  test("cos_sim is the cosine, rounded") {
    val m = Similarity.knnGraph(df, "vec_id", "embedding", model, k = 2)
      .filter(col("id") === 1 && col("nbr") === 2)
      .select("cos_sim").head().getDouble(0)
    assert(m == 1.0)
  }
}

class BloomGateSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every corpus-present key is flagged") {
    val corpus = (1 to 500).map(i => s"key$i").toDF("k")
    val batch = (400 to 700).map(i => (i.toLong, s"key$i")).toDF("id", "k")
    val got = Dedup.bloomGate(batch, corpus, Seq("k"))
      .select("id", "maybe_seen").as[(Long, Boolean)].collect().toMap
    // ids 400..500 are truly in the corpus: bloom MUST flag all of them
    assert((400L to 500L).forall(got(_)))
    // definitely-new verdicts must be true negatives (sound to skip)
    val defNew = got.filter(!_._2).keySet
    assert(defNew.forall(_ > 500L))
    // at 8M bits / 500 items the fp rate is ~0: new keys pass the gate
    assert(defNew.size > 150)
  }

  test("the probe plan is a pure projection: no exchange, no join") {
    val corpus = (1 to 100).map(i => s"k$i").toDF("k")
    val batch = (1 to 50).map(i => (i.toLong, s"k$i")).toDF("id", "k")
    val plan = Dedup.bloomGate(batch, corpus, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe side shuffled:\n$plan")
    assert(!plan.contains("Join"), s"probe side joined:\n$plan")
  }

  test("deterministic across runs; empty corpus flags nothing") {
    val corpus = (1 to 100).map(i => s"k$i").toDF("k")
    val batch = (50 to 150).map(i => (i.toLong, s"k$i")).toDF("id", "k")
    val a = Dedup.bloomGate(batch, corpus, Seq("k"))
      .select("id", "maybe_seen").as[(Long, Boolean)].collect().toSet
    val b = Dedup.bloomGate(batch, corpus, Seq("k"))
      .select("id", "maybe_seen").as[(Long, Boolean)].collect().toSet
    assert(a == b)
    val none = Dedup.bloomGate(batch, corpus.limit(0), Seq("k"))
    assert(none.filter(col("maybe_seen")).count() == 0)
  }
}

class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  test("cross-doc shingle fraction: shared block vs unique text") {
    val docs = Seq(
      (1L, "a b c d e unique1 tail1 here now"),
      (2L, "a b c d e unique2 tail2 there later"),
      (3L, "totally different words with no overlap at all"),
      (4L, "x"), // under n tokens: zero shingles
      (5L, null: String)
    ).toDF("doc_id", "text")
    val got = Dedup.crossDocShingleFrac(docs, "doc_id", "text", n = 5)
      .select("id", "n_shingles", "n_dup").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // docs 1/2: 9 tokens -> 5 shingles each; only "a b c d e" is shared
    assert(got(1L) == ((5L, 1L)) && got(2L) == ((5L, 1L)))
    assert(got(3L)._2 == 0L)          // nothing cross-doc
    assert(got(4L) == ((0L, 0L)))     // sub-n doc present with zeros
    assert(got(5L) == ((0L, 0L)))     // null text too
    val frac = Dedup.crossDocShingleFrac(docs, "doc_id", "text", n = 5)
      .filter(col("id") === 1).select("dup_frac").head().getDouble(0)
    assert(frac == 0.2)
  }
}

class AssignDistSpec extends SparkSpec {
  import spark.implicits._

  test("assignDist: squared distance to the assigned centroid") {
    val model = Ivf.Model(Array(Array(0.0, 0.0), Array(10.0, 0.0)))
    val got = Ivf.assignDist(
        Seq((1L, Array(1.0f, 1.0f)), (2L, Array(9.0f, 2.0f)))
          .toDF("id", "v"), "v", model)
      .select("id", "__cluster", "__dist2")
      .as[(Long, Int, Double)].collect()
      .map { case (id, c, d) => id -> ((c, math.rint(d * 1e9) / 1e9)) }
      .toMap
    assert(got(1L) == ((0, 2.0)))  // (1,1) -> origin: 1+1
    assert(got(2L) == ((1, 5.0)))  // (9,2) -> (10,0): 1+4
  }

  test("winsorize: nearest-rank bounds, outliers clamped, body untouched") {
    // group g: values 1..20 -> p5 rank ceil(1)=1 -> lo=1,
    // p95 rank ceil(19)=19 -> hi=19; 20 clamps to 19, rest unchanged
    val df = (1 to 20).map(i => ("g", i.toLong, i.toLong))
      .toDF("src", "id", "v")
    val got = CorpusStats.winsorize(df, Seq("src"), "v", 0.05, 0.95)
      .select("v", "lo", "hi", "v_wins")
      .as[(Long, Long, Long, Long)].collect().toMap2
    assert(got.values.map(_._1).toSet == Set(1L) &&
      got.values.map(_._2).toSet == Set(19L), s"bounds: $got")
    assert(got(20L)._3 == 19L, "top outlier clamps to hi")
    assert((1 to 19).forall(i => got(i.toLong)._3 == i.toLong),
      "body values pass through")
  }

  test("winsorize: degenerate percentiles and single-row groups") {
    val df = Seq(("a", 1L, 7L), ("b", 2L, 3L), ("b", 3L, 100L))
      .toDF("src", "id", "v")
    // p=[0,1]: lo falls back to group min (rank 0 selects nothing),
    // hi = max -> nothing clamps
    val full = CorpusStats.winsorize(df, Seq("src"), "v", 0.0, 1.0)
      .select("v", "v_wins").as[(Long, Long)].collect()
    assert(full.forall { case (v, w) => v == w }, full.mkString(","))
    // single-row group: every bound is the value itself
    val one = CorpusStats.winsorize(df.filter($"src" === "a"),
      Seq("src"), "v", 0.05, 0.95)
      .select("lo", "hi", "v_wins").as[(Long, Long, Long)].head()
    assert(one == ((7L, 7L, 7L)))
  }

  test("quantileNormalize: [0,1] band, tie-stable, singleton at 0.5") {
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 20L),
      ("g", 4L, 40L), ("g", 5L, 50L), ("solo", 6L, 99L))
      .toDF("src", "id", "v")
    val got = CorpusStats.quantileNormalize(df, Seq("src"), "v")
      .select("id", "q_norm").as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.0 && got(5L) == 1.0, s"extremes pin 0 and 1: $got")
    assert(got(2L) == got(3L), s"equal values share q (min-rank ties): $got")
    assert(got(2L) == 0.25, s"tied pair sits at min rank 2 -> 0.25: $got")
    assert(got(4L) == 0.75, s"rank above a tie still counts both: $got")
    assert(got(6L) == 0.5, "single-member group sits mid-scale")
  }

  test("madOutliers: hand-computed median/MAD, Hampel flag, exact int64") {
    // group g: 1..9 plus a 1000 blob. n=10 -> median = value at rank 5
    // = 5; deviations |v-5| = {4,3,2,1,0,1,2,3,4,995} sorted
    // {0,1,1,2,2,3,3,4,4,995} -> MAD = value at rank 5 = 2; cut 3 ->
    // flag |v-5| > 6: only the blob. A mean/σ gate would put the mean
    // at ~104 and σ ~314 — the blob barely 3σ, the body all "normal".
    val df = ((1 to 9).map(i => ("g", i.toLong, i.toLong)) :+
      (("g", 10L, 1000L))).toDF("src", "id", "v")
    val got = CorpusStats.madOutliers(df, Seq("src"), "id", "v")
      .select("id", "med", "mad", "is_outlier")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, m, d, o) => id -> ((m, d, o)) }.toMap
    assert(got.values.forall { case (m, d, _) => m == 5L && d == 2L })
    assert(got(10L)._3 == 1L, "the blob is the outlier")
    assert((1L to 9L).forall(got(_)._3 == 0L), "the body is not")
    // all-equal group: MAD = 0 -> nothing exceeds 3*0 strictly... except
    // any deviation > 0; with all values equal nothing is flagged
    val eq = CorpusStats.madOutliers(
      Seq(("e", 1L, 7L), ("e", 2L, 7L)).toDF("src", "id", "v"),
      Seq("src"), "id", "v")
      .select("is_outlier").as[Long].collect()
    assert(eq.forall(_ == 0L))
  }

  private implicit class Quads(rows: Array[(Long, Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long, Long)] =
      rows.map { case (v, lo, hi, w) => v -> (lo, hi, w) }.toMap
  }
}
