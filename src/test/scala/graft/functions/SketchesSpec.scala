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
