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
}
