package graft.ops

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // site A: "nav" on all 3 docs (df=3/3 → strip), "promo" on 1 (keep)
    (1L, "a", "nav\nalpha\npromo"),
    (2L, "a", "nav\nbeta"),
    (3L, "a", "nav\ngamma"),
    // site B: same "nav" line but only 1 of 2 docs (50% but df=1 < minDf)
    (4L, "b", "nav\ndelta"),
    (5L, "b", "epsilon")
  ).toDF("doc_id", "site", "text")

  test("strips only lines frequent within their own group") {
    val r = Boilerplate.strip(docs, "doc_id", "site", "text")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, "alpha\npromo", 2L, 1L),
      (2L, "beta", 1L, 1L),
      (3L, "gamma", 1L, 1L),
      (4L, "nav\ndelta", 2L, 0L), // site B's nav is NOT boilerplate
      (5L, "epsilon", 1L, 0L)))
  }

  test("fully-boilerplate doc survives with empty text") {
    val all = Seq((1L, "a", "nav"), (2L, "a", "nav"), (3L, "a", "nav\nx"))
      .toDF("doc_id", "site", "text")
    val r = Boilerplate.strip(all, "doc_id", "site", "text")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq((1L, "", 0L, 1L), (2L, "", 0L, 1L), (3L, "x", 1L, 1L)))
  }

  test("line order is preserved after removal") {
    val d = Seq((1L, "a", "x\nnav\ny\nz"), (2L, "a", "nav"))
      .toDF("doc_id", "site", "text")
    val r = Boilerplate.strip(d, "doc_id", "site", "text")
      .filter($"doc_id" === 1L).head()
    assert(r.getString(1) == "x\ny\nz")
  }

  test("blank lines are never boilerplate: paragraph breaks survive") {
    val d = Seq(
      (1L, "a", "p1\n\np2"), (2L, "a", "x\n\ny"), (3L, "a", "z\n\nw")
    ).toDF("doc_id", "site", "text")
    val r = Boilerplate.strip(d, "doc_id", "site", "text")
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    // the empty middle line appears in 3/3 docs but must NOT strip
    assert(r.map(_._2) == Seq("p1\n\np2", "x\n\ny", "z\n\nw"))
    assert(r.forall(_._4 == 0L))
  }

  test("lineStats exposes the decision table") {
    val s = Boilerplate.lineStats(docs, "doc_id", "site", "text")
      .filter($"line" === "nav")
      .select("site", "df", "n_docs")
      .as[(String, Long, Long)].collect().toSet
    assert(s == Set(("a", 3L, 3L), ("b", 1L, 2L)))
  }

  test("plan: no cartesian products, boilerplate side broadcasts") {
    val plan = Boilerplate.strip(docs, "doc_id", "site", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
