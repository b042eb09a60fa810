package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextExprsSpec extends SparkSpec {
  import spark.implicits._

  private val deco = "cafe\u0301 noe\u0308l" // combining marks
  private val pre = "caf\u00e9 no\u00ebl" // precomposed

  test("nfc folds decomposed sequences to the canonical form") {
    val got = Seq(deco, pre, "plain ascii", null)
      .toDF("t").select(TextExprs.nfc(col("t")).as("n"))
      .as[String].collect().toSeq
    assert(got(0) == pre)          // decomposed -> precomposed
    assert(got(1) == pre)          // already canonical: unchanged
    assert(got(2) == "plain ascii")
    assert(got(3) == null)         // null-safe
  }

  test("nfc makes byte-level fingerprints agree across encodings") {
    val fps = Seq((1L, deco), (2L, pre)).toDF("id", "t")
      .select(md5(TextExprs.nfc(col("t"))).as("fp"))
      .as[String].collect().toSet
    assert(fps.size == 1) // without nfc these md5s differ
  }

  test("nfkc additionally folds compatibility forms") {
    // U+FB01 LATIN SMALL LIGATURE FI and a full-width digit
    val got = Seq("\ufb01le \uff12").toDF("t")
      .select(TextExprs.nfkc(col("t")).as("n")).head().getString(0)
    assert(got == "file 2")
    // nfc leaves compatibility characters alone
    val nfc = Seq("\ufb01le").toDF("t")
      .select(TextExprs.nfc(col("t")).as("n")).head().getString(0)
    assert(nfc == "\ufb01le")
  }

  test("invalid form is rejected at analysis") {
    val e = UnicodeNormalize(
      org.apache.spark.sql.graft.Shims.expression(col("t")), "NFX")
    assert(e.checkInputDataTypes().isFailure)
  }

  test("graft_normalize is reachable from SQL") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(s"SELECT graft_normalize('$deco', 'NFC') AS n")
      .head().getString(0)
    assert(got == pre)
  }

  // ---- EditLowerBound: the verify-stage counting filter -----------------

  /** Reference edit distance (full DP) for the soundness property. */
  private def lev(a: String, b: String): Int = {
    val (n, m) = (a.codePointCount(0, a.length), b.codePointCount(0, b.length))
    val ai = a.codePoints().toArray
    val bi = b.codePoints().toArray
    val d = Array.tabulate(n + 1, m + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to n; j <- 1 to m)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (ai(i - 1) == bi(j - 1)) 0 else 1))
    d(n)(m)
  }

  test("editLowerBound never exceeds the true edit distance (soundness)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde éüλ中文 " // multi-byte chars included on purpose
    def randStr(n: Int): String =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val cases = (0 until 200).map { _ =>
      val a = randStr(rnd.nextInt(30))
      // half the pairs are mutations of a (near-dups), half independent
      val b = if (rnd.nextBoolean()) randStr(rnd.nextInt(30))
      else a.map(c => if (rnd.nextInt(10) == 0) 'z' else c).mkString
      (a, b)
    } ++ Seq(("", ""), ("", "abc"), ("abc", ""), ("中文", "中斌"))
    val df = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        TextExprs.editLowerBound(col("a"), col("b")).as("lb"))
    df.collect().foreach { r =>
      val (a, b, lb) = (r.getString(0), r.getString(1), r.getInt(2))
      assert(lb <= lev(a, b), s"bound $lb > lev for '$a' vs '$b'")
      assert(lb >= 0)
    }
  }

  test("editLowerBound is exact on pure insert/delete and detects disjoint content") {
    val got = Seq(("aaaa", "aaaaaa"), ("abc", "xyz"), ("same", "same"))
      .toDF("a", "b")
      .select(TextExprs.editLowerBound(col("a"), col("b")))
      .as[Int].collect().toSeq
    assert(got(0) == 2)   // length gap
    assert(got(1) == 3)   // disjoint histograms: L1=6 -> bound 3
    assert(got(2) == 0)
  }

  test("levenshteinThreshold with a per-row threshold column early-exits") {
    val got = Seq(("kitten", "sitting", 10), ("kitten", "sitting", 2))
      .toDF("a", "b", "t")
      .select(TextExprs.levenshteinThreshold(
        col("a"), col("b"), col("t")).as("d"))
      .as[Int].collect().toSeq
    assert(got(0) == 3)
    assert(got(1) == -1) // distance 3 > per-row budget 2
  }
}
