package graft.merge

import graft.SparkSpec
import graft.core.Cdc
import org.apache.spark.sql.DataFrame

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // (pk, version, value, op)
  private def stageDF(rows: Seq[(Int, Long, String, String)]): DataFrame =
    rows.toDF("pk", "ver", "v", Cdc.OperationColumn)

  private def hist(df: DataFrame): Set[(Int, Long, Option[Long], Boolean, String)] =
    df.select("pk", "valid_from", "valid_to", "is_current", "v")
      .as[(Int, Long, Option[Long], Boolean, String)].collect().toSet

  private val events = Seq(
    (1, 10L, "a1", Cdc.OpCreate), (1, 20L, "a2", Cdc.OpUpdate),
    (1, 30L, "a3", Cdc.OpUpdate),
    (2, 10L, "b1", Cdc.OpCreate), (2, 25L, "b1", Cdc.OpDelete),
    (2, 40L, "b2", Cdc.OpCreate), // delete-then-recreate
    (3, 15L, "c1", Cdc.OpCreate))

  test("build: intervals chain per pk, deletes close without emitting") {
    val got = hist(Scd2.build(stageDF(events), Seq("pk"), "ver"))
    assert(got == Set(
      (1, 10L, Some(20L), false, "a1"),
      (1, 20L, Some(30L), false, "a2"),
      (1, 30L, None, true, "a3"),
      (2, 10L, Some(25L), false, "b1"), // closed BY the delete
      (2, 40L, None, true, "b2"),
      (3, 15L, None, true, "c1")))
  }

  test("build: duplicate (pk, version) re-deliveries collapse to one row") {
    val got = hist(Scd2.build(
      stageDF(events ++ Seq((1, 20L, "a2", Cdc.OpUpdate))), Seq("pk"), "ver"))
    assert(got.size == 6 && got.count { case (pk, f, _, _, _) =>
      pk == 1 && f == 20L } == 1)
  }

  test("merge: incremental advance equals the one-shot build") {
    val (first, second) = events.sortBy(_._2).splitAt(4)
    val incremental = Scd2.merge(
      Scd2.build(stageDF(first), Seq("pk"), "ver"),
      stageDF(second), Seq("pk"), "ver")
    assert(hist(incremental) ==
      hist(Scd2.build(stageDF(events), Seq("pk"), "ver")))
  }

  test("merge: late versions at/before the open row are dropped, closed history immutable") {
    val h = Scd2.build(stageDF(events), Seq("pk"), "ver")
    // pk=1 open at 30: a version at 30 (dup) and one at 5 (stale) both
    // drop; a fresh 35 closes 30
    val advanced = Scd2.merge(h, stageDF(Seq(
      (1, 30L, "dup", Cdc.OpUpdate), (1, 5L, "stale", Cdc.OpUpdate),
      (1, 35L, "a4", Cdc.OpUpdate))), Seq("pk"), "ver")
    val got = hist(advanced)
    assert(got.contains((1, 30L, Some(35L), false, "a3")))
    assert(got.contains((1, 35L, None, true, "a4")))
    assert(!got.exists { case (_, _, _, _, v) => v == "dup" || v == "stale" })
    // untouched pks keep their full history
    assert(got.contains((2, 10L, Some(25L), false, "b1")))
    assert(got.contains((3, 15L, None, true, "c1")))
  }

  test("asOf: point-in-time read reconstructs the dimension at any version") {
    val h = Scd2.build(stageDF(events), Seq("pk"), "ver")
    def at(v: Long) = Scd2.asOf(h, v).select("pk", "v")
      .as[(Int, String)].collect().toMap
    assert(at(12L) == Map(1 -> "a1", 2 -> "b1"))       // before 3 exists
    assert(at(26L) == Map(1 -> "a2", 3 -> "c1"))       // 2 deleted at 25
    assert(at(100L) == Map(1 -> "a3", 2 -> "b2", 3 -> "c1")) // latest
    assert(at(5L).isEmpty)                              // before history
  }

  test("merge: delete in the batch closes the open row and leaves no current version") {
    val h = Scd2.build(stageDF(events), Seq("pk"), "ver")
    val got = hist(Scd2.merge(h,
      stageDF(Seq((3, 50L, "c1", Cdc.OpDelete))), Seq("pk"), "ver"))
    assert(got.contains((3, 15L, Some(50L), false, "c1")))
    assert(!got.exists { case (pk, _, _, cur, _) => pk == 3 && cur })
  }
}
