package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("chunk covers every token with the declared overlap") {
    val text = (1 to 99).map(i => s"w$i").mkString(" ")
    val out = TextOps.chunk(Seq((1L, text)).toDF("id", "t"), "id", "t",
      budget = 40, overlap = 8)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_tokens", "chunk")
      .as[(Long, Long, String)].collect().toSeq
    assert(out.map(_._1) == Seq(0L, 1L, 2L))
    assert(out.map(_._2) == Seq(40L, 40L, 35L))
    // chunk k starts at token k*32+1; consecutive chunks overlap by 8
    assert(out(0)._3.startsWith("w1 ") && out(1)._3.startsWith("w33 "))
    assert(out(0)._3.split(" ").takeRight(8).toSeq ==
      out(1)._3.split(" ").take(8).toSeq)
    // full coverage: union of chunk tokens = original tokens
    assert(out.flatMap(_._3.split(" ")).toSet == text.split(" ").toSet)
  }

  test("chunk edge cases: short doc → itself; blank → nothing") {
    val df = Seq((1L, "a b c"), (2L, "   "), (3L, null: String))
      .toDF("id", "t")
    val out = TextOps.chunk(df, "id", "t", budget = 40, overlap = 8)
      .select("id", "chunk_id", "chunk").as[(Long, Long, String)]
      .collect().toSeq
    assert(out == Seq((1L, 0L, "a b c")))
  }

  test("contamination flags benchmark-overlapping docs only") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // copies benchmark text
      (2L, "one two three four five"),        // disjoint
      (3L, "x alpha beta gamma y")            // partial overlap (1 shingle)
    ).toDF("id", "t")
    val bench = Seq(Tuple1("alpha beta gamma delta epsilon")).toDF("bt")
    val out = Dedup.contamination(corpus, "id", "t", bench, "bt", n = 3)
      .select("id", "n_hits", "contaminated")
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(out(0) == ((1L, 3L, true)))  // 3 distinct 3-grams, all shared
    assert(out(1) == ((2L, 0L, false)))
    assert(out(2) == ((3L, 1L, true)))
  }
}
