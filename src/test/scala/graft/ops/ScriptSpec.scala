package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TextOps.scriptColumns: per-script letter fractions + dominant-script
  * routing decision. */
class ScriptSpec extends SparkSpec {
  import spark.implicits._

  private def profile(s: String): Map[String, Any] = {
    val df = Seq(s).toDF("t")
    val cols = TextOps.scriptColumns(col("t"))
    val row = df.select(cols.map { case (n, c) => c.as(n) }: _*).head()
    cols.map(_._1).zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
  }

  test("pure-latin text") {
    val p = profile("hello world 123")
    assert(p("n_letters") == 10L)
    assert(p("frac_latin") == 1.0 && p("frac_han") == 0.0)
    assert(p("script") == "latin")
  }

  test("mixed text picks the majority script; digits/punct excluded") {
    val p = profile("ok привет мир!")
    assert(p("n_letters") == 11L) // ok + приветмир
    assert(p("script") == "cyrillic")
    assert(p("frac_cyrillic") == math.round(9.0 / 11.0 * 10000) / 10000.0)
  }

  test("han and arabic detected") {
    assert(profile("你好世界")("script") == "han")
    assert(profile("مرحبا")("script") == "arabic")
  }

  test("no profiled letters -> other; empty/null safe") {
    assert(profile("12345 !!!")("script") == "other")
    assert(profile("")("script") == "other")
    val p = Seq[(Integer, String)]((1, null)).toDF("id", "t")
      .select(TextOps.scriptColumns(col("t")).map { case (n, c) =>
        c.as(n) }: _*).head()
    assert(p.getAs[String]("script") == "other")
  }

  test("tie goes to the first-listed script") {
    // 2 latin letters, 2 cyrillic letters
    assert(profile("ab пр")("script") == "latin")
  }

  test("supplementary-plane code points count once (surrogate pairs)") {
    // U+1D504 MATHEMATICAL FRAKTUR A: a letter of script Common —
    // counts in n_letters, lands in no profiled script bucket
    val p = profile("𝔄a")
    assert(p("n_letters") == 2L)
    assert(p("frac_latin") == 0.5)
  }

  test("graft_script_counts is reachable from SQL") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql("SELECT graft_script_counts('ab мир') AS c")
      .head().getSeq[Long](0)
    assert(got == Seq(5L, 2L, 3L, 0L, 0L))
  }

  test("single-pass expression matches the regex formulation") {
    val samples = Seq("hello мир 你好 مرحبا 123!", "", "abcПРИ漢字",
      "𝔄 mixed ціла 台北")
    samples.foreach { s =>
      val df = Seq(s).toDF("t")
      val fast = df.select(
        graft.functions.ScriptExprs.scriptCounts(col("t"))).head()
        .getSeq[Long](0)
      val slow = df.select(
        length(regexp_replace(col("t"), "[^\\p{L}]", "")).cast("long"),
        length(regexp_replace(col("t"), "[^\\p{IsLatin}]", "")).cast("long"),
        length(regexp_replace(col("t"), "[^\\p{IsCyrillic}]", "")).cast("long"),
        length(regexp_replace(col("t"), "[^\\p{IsHan}]", "")).cast("long"),
        length(regexp_replace(col("t"), "[^\\p{IsArabic}]", "")).cast("long"))
        .head()
      assert(fast == (0 to 4).map(slow.getLong), s"mismatch on '$s'")
    }
  }
}
