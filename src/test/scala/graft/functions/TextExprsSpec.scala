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
}
