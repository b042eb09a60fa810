package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch: one-sided error, merge algebra, weighted streams. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  // a zipf-ish stream: key k appears ~ 2000/k times
  private def stream: DataFrame = {
    val rows = for {
      k <- 1 to 50
      _ <- 1 to (2000 / k)
    } yield s"key$k"
    rows.toDF("term")
  }

  private def exact: Map[String, Long] =
    stream.groupBy("term").count().as[(String, Long)].collect().toMap

  private def estimates(sk: DataFrame): Map[String, Long] =
    Sketches.cmsLookup(sk, stream.distinct(), "term")
      .as[(String, Long)].collect().toMap

  test("estimate >= exact for every key (no under-count), excess bounded") {
    val est = estimates(Sketches.cmsSketch(stream, col("term")))
    val ex = exact
    val n = stream.count()
    ex.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k under-counted: ${est(k)} < $c")
      // min-over-d bound: excess ≤ 2·N/w with overwhelming probability
      assert(est(k) - c <= 2 * n / Sketches.CmsW + 1,
        s"$k excess ${est(k) - c} too large")
    }
  }

  test("unseen key estimates 0 or small (bucket collision only)") {
    val sk = Sketches.cmsSketch(stream, col("term"))
    val unseen = Seq("never-in-stream-xyz").toDF("term")
    val est = Sketches.cmsLookup(sk, unseen, "term")
      .head().getLong(1)
    assert(est <= 2 * stream.count() / Sketches.CmsW + 1)
  }

  test("merge of split-stream sketches == sketch of whole stream") {
    val withId = stream.withColumn("half",
      abs(Portable.h60(col("term"))) % 2)
    val a = Sketches.cmsSketch(withId.filter($"half" === 0), col("term"))
    val b = Sketches.cmsSketch(withId.filter($"half" === 1), col("term"))
    val merged = Sketches.cmsMerge(a.union(b))
      .orderBy("row", "bucket").as[(Int, Int, Long)].collect().toSeq
    val whole = Sketches.cmsSketch(stream, col("term"))
      .orderBy("row", "bucket").as[(Int, Int, Long)].collect().toSeq
    assert(merged == whole)
  }

  test("weighted stream counts weight mass, not occurrences") {
    val df = Seq(("a", 10L), ("a", 5L), ("b", 7L)).toDF("term", "w")
    val sk = Sketches.cmsSketch(df, col("term"), weight = col("w"))
    val est = Sketches.cmsLookup(sk, Seq("a", "b").toDF("term"), "term")
      .as[(String, Long)].collect().toMap
    assert(est("a") >= 15L && est("b") >= 7L)
    assert(est("a") <= 22L) // at worst both collide in every row
  }

  test("sketch never exceeds d*w rows") {
    val sk = Sketches.cmsSketch(stream, col("term"))
    assert(sk.count() <= Sketches.CmsD.toLong * Sketches.CmsW)
  }
}
