package graft.ops

import graft.SparkSpec

class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  test("ids follow corpus frequency rank; OOV is 0; order preserved") {
    // counts: b=4, a=3, z=1 → vocab(2): b=1, a=2; z OOV
    val docs = Seq(
      (1L, "a b b"), (2L, "b a z"), (3L, "b a")
    ).toDF("id", "t")
    val r = TextOps.tokenizeToIds(docs, "id", "t", vocabSize = 2)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, "2 1 1", 3L, 0L),
      (2L, "1 2 0", 3L, 1L),
      (3L, "1 2", 2L, 0L)))
  }

  test("frequency ties rank alphabetically") {
    val docs = Seq((1L, "b a")).toDF("id", "t")
    val r = TextOps.tokenizeToIds(docs, "id", "t", vocabSize = 2)
      .as[(Long, String, Long, Long)].head()
    assert(r._2 == "2 1") // a=1, b=2 despite b appearing first
  }

  test("empty and null docs survive with empty ids") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "x"))
      .toDF("id", "t")
    val r = TextOps.tokenizeToIds(docs, "id", "t", vocabSize = 8)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq((1L, "", 0L, 0L), (2L, "", 0L, 0L), (3L, "1", 1L, 0L)))
  }
}
