package graft.merge

import graft.SparkSpec
import graft.core.Cdc
import org.apache.spark.sql.functions._

/** SCD-1 merge semantics (SURVEY §2.4 R1-R7; FIXTURES.md §8): replay a
  * C/U/D event sequence and assert last-writer-wins with DELETE removal. */
class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  // target: pk -> val
  private def target = Seq((1, "a"), (2, "b"), (3, "c"))
    .toDF("pk", "v")

  // stage events (kafkaoffset, op, pk, v):
  //  pk=1 updated twice (offset 11 then 13 wins), pk=2 deleted,
  //  pk=4 created then updated, pk=5 created then deleted.
  private def stage = Seq(
    ("10", Cdc.OpCreate, 4, "d0"),
    ("11", Cdc.OpUpdate, 1, "a1"),
    ("12", Cdc.OpDelete, 2, "b"),
    ("13", Cdc.OpUpdate, 1, "a2"),
    ("14", Cdc.OpUpdate, 4, "d1"),
    ("15", Cdc.OpCreate, 5, "e"),
    ("16", Cdc.OpDelete, 5, "e")
  ).toDF(Cdc.OffsetColumn, Cdc.OperationColumn, "pk", "v")

  test("R1 dedupe keeps max kafkaoffset per pk (numeric order)") {
    val d = CdcMerge.dedupe(stage, Seq("pk"))
      .select("pk", Cdc.OffsetColumn).as[(Int, String)].collect().toMap
    assert(d == Map(1 -> "13", 2 -> "12", 4 -> "14", 5 -> "16"))
  }

  test("R1 dedupe orders numerically, not lexically") {
    // offset "9" < "11" lexically would pick the wrong winner
    val s = Seq(("9", Cdc.OpUpdate, 1, "old"), ("11", Cdc.OpUpdate, 1, "new"))
      .toDF(Cdc.OffsetColumn, Cdc.OperationColumn, "pk", "v")
    val d = CdcMerge.dedupe(s, Seq("pk")).select("v").as[String].collect()
    assert(d.toSeq == Seq("new"))
  }

  test("R2 delete-common removes target rows with staged pks") {
    val kept = CdcMerge.deleteCommon(target, stage, Seq("pk"))
      .select("pk").as[Int].collect().toSet
    assert(kept == Set(3)) // pks 1,2 staged; 4,5 not in target
  }

  test("R3 drop DELETE ops") {
    val ops = CdcMerge.dropDeleteOps(stage)
      .select(Cdc.OperationColumn).distinct().as[String].collect().toSet
    assert(ops == Set(Cdc.OpCreate, Cdc.OpUpdate))
  }

  test("R6 event counts") {
    val counts = CdcMerge.eventCounts(stage)
      .as[(String, Long)].collect().toMap
    assert(counts == Map(Cdc.OpCreate -> 2L, Cdc.OpUpdate -> 3L,
      Cdc.OpDelete -> 2L))
  }

  test("R5 skipMerge eligibility") {
    assert(CdcMerge.skipMergeEligible(5, 0, 0))
    assert(!CdcMerge.skipMergeEligible(5, 1, 0))
    assert(!CdcMerge.skipMergeEligible(5, 0, 1))
    assert(!CdcMerge.skipMergeEligible(0, 0, 0))
  }

  test("full merge: last-writer-wins upsert with deletes") {
    val out = CdcMerge.merge(target, stage, Seq("pk"))
      .as[(Int, String)].collect().toMap
    // 1 -> a2 (updated, offset 13), 2 deleted, 3 untouched, 4 -> d1, 5 deleted
    assert(out == Map(1 -> "a2", 3 -> "c", 4 -> "d1"))
  }

  test("merge is idempotent (reference: 'loader is idempotent')") {
    val once = CdcMerge.merge(target, stage, Seq("pk"))
    val twice = CdcMerge.merge(once, stage, Seq("pk"))
    assert(twice.as[(Int, String)].collect().toMap ==
      once.as[(Int, String)].collect().toMap)
  }

  test("merge with composite primary keys") {
    // (tenant, region) composite key: same tenant, different regions are
    // DIFFERENT rows — a single-column merge would conflate them
    val tgt = Seq(("a", 1, "old1"), ("a", 2, "old2"), ("b", 1, "old3"))
      .toDF("tenant", "region", "v")
    val st = Seq(
      ("20", Cdc.OpUpdate, "a", 1, "mid1"),
      ("21", Cdc.OpDelete, "a", 2, "old2"),
      ("22", Cdc.OpCreate, "b", 2, "new2"),
      ("23", Cdc.OpUpdate, "a", 1, "new1") // later offset wins on (a,1)
    ).toDF(Cdc.OffsetColumn, Cdc.OperationColumn, "tenant", "region", "v")
    val out = CdcMerge.merge(tgt, st, Seq("tenant", "region"))
      .as[(String, Int, String)].collect()
      .map { case (t, r, v) => (t, r) -> v }.toMap
    assert(out == Map(
      ("a", 1) -> "new1", // updated, last offset wins
      ("b", 1) -> "old3", // untouched
      ("b", 2) -> "new2")) // created; (a,2) deleted
  }

  test("merge plan broadcasts stage keys (target never shuffles)") {
    val plan = CdcMerge.merge(target, stage, Seq("pk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"expected broadcast anti-join in:\n$plan")
  }
}
