package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Portable HLL sketch: accuracy, merge algebra, persistence. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val P = 8
  private val M = 1 << P

  private def keys(n: Int, tag: String): DataFrame =
    spark.range(n.toLong).select(lit("g").as("g"),
      concat(lit(tag), $"id".cast("string")).as("k"))

  private def sketchOf(df: DataFrame): Seq[Int] =
    Sketches.hllSketch(df, Seq("g"), col("k"), P)
      .select("hll").head().getSeq[Int](0)

  private def estimateOf(df: DataFrame): Double =
    Sketches.hllSketch(df, Seq("g"), col("k"), P)
      .select(Sketches.hllEstimate(col("hll"), P)).head().getDouble(0)

  test("register array has size m, ranks within [0, maxRank]") {
    val sk = sketchOf(keys(1000, "a:"))
    assert(sk.size == M)
    assert(sk.forall(r => r >= 0 && r <= Sketches.maxRank(P)))
    assert(sk.exists(_ > 0))
  }

  test("estimate within 3*rsd of exact for 10k distinct (raw branch)") {
    val n = 10000
    val est = estimateOf(keys(n, "b:"))
    val rsd = 1.04 / math.sqrt(M.toDouble)
    assert(math.abs(est - n) / n < 3 * rsd,
      s"est $est vs exact $n exceeds 3*rsd=${3 * rsd}")
  }

  test("small cardinality uses linear counting and is near-exact") {
    val n = 40
    val est = estimateOf(keys(n, "c:"))
    assert(math.abs(est - n) / n < 0.15, s"est $est vs exact $n")
  }

  test("duplicates do not move the sketch (insert idempotence)") {
    val once = sketchOf(keys(500, "d:"))
    val thrice = sketchOf(
      keys(500, "d:").union(keys(500, "d:")).union(keys(500, "d:")))
    assert(once == thrice)
  }

  test("merge of split sketches == sketch of union (register-exact)") {
    val a = keys(3000, "e:")
    val b = keys(3000, "f:")
    val skA = sketchOf(a)
    val skB = sketchOf(b)
    val merged = Seq((skA, skB)).toDF("x", "y")
      .select(Sketches.hllMerge(col("x"), col("y"))).head().getSeq[Int](0)
    assert(merged == sketchOf(a.union(b)))
  }

  test("hllMergeAgg over per-part sketches == direct sketch; merge is " +
      "idempotent") {
    val df = keys(5000, "h:")
      .withColumn("part", abs(Portable.h60(col("k"))) % 7)
    val parts = Sketches.hllSketch(df, Seq("g", "part"), col("k"), P)
    val merged = Sketches.hllMergeAgg(parts, Seq("g"), P)
      .select("hll").head().getSeq[Int](0)
    assert(merged == sketchOf(df.select("g", "k")))
    // idempotent: folding the merged sketch in again changes nothing
    val again = Sketches.hllMergeAgg(
      parts.select("g", "hll")
        .union(Seq(("g", merged)).toDF("g", "hll")),
      Seq("g"), P).select("hll").head().getSeq[Int](0)
    assert(again == merged)
  }

  test("persisted sketch + new batch == full-corpus sketch (incremental)") {
    val history = keys(4000, "i:")
    val batch = keys(800, "j:")
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    Sketches.hllSketch(history, Seq("g"), col("k"), P)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val incremental = Sketches.hllMergeAgg(
      stored.union(Sketches.hllSketch(batch, Seq("g"), col("k"), P)),
      Seq("g"), P).select("hll").head().getSeq[Int](0)
    assert(incremental == sketchOf(history.union(batch)))
  }

  test("fixed-point intsum is exact: empty sketch sums to m * 2^maxRank-…") {
    // all-zero registers: intsum = m * 2^(maxRank) with rank 0 ⇒ each
    // term 2^(61-p), m terms ⇒ exactly 2^61
    val empty = Seq(Seq.fill(M)(0)).toDF("hll")
    val s = empty.select(Sketches.hllIntSum(col("hll"), P)).head().getLong(0)
    assert(s == (1L << 61))
    val z = empty.select(Sketches.hllZeros(col("hll"))).head().getInt(0)
    assert(z == M)
  }

  test("qsketch: quantiles within 1/16 relative of exact; merge exact") {
    val rnd = new scala.util.Random(11)
    val vals = (1 to 20000).map(_ => math.exp(rnd.nextGaussian()) * 10.0)
    val df = vals.map(("g", _)).toDF("g", "v")
    val sk = Sketches.qSketch(df, Seq("g"), col("v"))
    val got = Sketches.qQuantiles(sk, Seq("g"), Seq(0.5, 0.95, 0.99))
      .select("q", "est").as[(Double, Double)].collect().toMap
    val sorted = vals.sorted
    Seq(0.5, 0.95, 0.99).foreach { q =>
      val exact = sorted(math.ceil(q * sorted.size).toInt - 1)
      val est = got(q)
      assert(est <= exact, s"q=$q lower bound $est above exact $exact")
      assert(exact / est <= 1.0 + 1.0 / 16 + 1e-9,
        s"q=$q est $est vs exact $exact out of 1/16 band")
    }
    // merge: two half-sketches sum to the whole sketch, bucket-exact
    val (h1, h2) = vals.splitAt(vals.size / 2)
    val m = Sketches.qMerge(
      Sketches.qSketch(h1.map(("g", _)).toDF("g", "v"), Seq("g"), col("v"))
        .union(Sketches.qSketch(h2.map(("g", _)).toDF("g", "v"),
          Seq("g"), col("v"))),
      Seq("g"))
    assert(m.orderBy("bucket").as[(String, Int, Long)].collect().toSeq ==
      sk.orderBy("bucket").as[(String, Int, Long)].collect().toSeq)
  }

  test("qsketch: values below resolution land exactly; quantile " +
      "extraction is monotone in q") {
    // mid-cell values: (i+0.5)/QScale floors to cell i robustly (the
    // 0.5 margin absorbs the double round-trip ulp; i/QScale itself can
    // land one cell low, which is correct floor semantics, not a bug)
    val df = (1 to 31).map(i => ("g", (i + 0.5) / Sketches.QScale))
      .toDF("g", "v")
    val sk = Sketches.qSketch(df, Seq("g"), col("v"))
    // every scaled value < 32 gets its own exact cell
    assert(sk.count() == 31)
    val qs = Seq(0.1, 0.3, 0.5, 0.7, 0.9, 1.0)
    val ests = Sketches.qQuantiles(sk, Seq("g"), qs)
      .select("q", "est").as[(Double, Double)].collect().toMap
    val ordered = qs.map(ests)
    assert(ordered == ordered.sorted, s"non-monotone: $ordered")
    // p100 of 1..31 scaled = 31/QScale exactly
    assert(math.abs(ests(1.0) - 31 / Sketches.QScale) < 1e-12)
  }

  test("driver/SQL rank agreement on known hashes") {
    // rankOf must equal 61-p - bitLength(h >> p) (0 ⇒ maxRank)
    val hs = Seq(0L, 1L, 255L, 256L, 257L, (1L << 59) + 5, (1L << 60) - 1)
    val df = hs.toDF("h")
    val got = df.select(Sketches.rankOf(col("h"), P)).collect().map(_.getInt(0))
    val want = hs.map { h =>
      val w = h >>> P
      if (w == 0) Sketches.maxRank(P)
      else Sketches.maxRank(P) - (64 - java.lang.Long.numberOfLeadingZeros(w))
    }
    assert(got.toSeq == want)
  }
}
