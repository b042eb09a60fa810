package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BandedIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  // negative times included: floor-div banding must stay exact below zero
  private def intervalJoin(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    val lf = Seq((1L, -13L), (2L, 0L), (3L, 9L), (4L, 40L)).toDF("lid", "lt")
    val rf = Seq((10L, -5L), (11L, 7L), (12L, 30L), (13L, 41L)).toDF("rid", "rt")
    lf.join(rf, abs(col("lt") - col("rt")) <= lit(10L))
      .select("lid", "rid")
  }

  test("rule rewrites the BNLJ interval join into a banded equi-join") {
    val fresh = spark.newSession()
    val before = intervalJoin(fresh)
    assert(before.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoop"))
    val expected = before.as[(Long, Long)].collect().toSet

    graft.GraftExtensions.register(fresh)
    val after = intervalJoin(fresh)
    val plan = after.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      plan)
    assert(after.as[(Long, Long)].collect().toSet == expected)
    assert(expected == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L),
      (4L, 12L), (4L, 13L)))
  }

  test("rule leaves equi-keyed and non-matching joins alone") {
    val fresh = spark.newSession()
    graft.GraftExtensions.register(fresh)
    import fresh.implicits._
    val lf = Seq((1L, 5L)).toDF("lid", "lt")
    val rf = Seq((1L, 7L)).toDF("rid", "rt")
    // equi key present: hash join on it is already right; rule must not fire
    val equi = lf.join(rf, col("lid") === col("rid") &&
      abs(col("lt") - col("rt")) <= lit(10L))
    assert(!equi.queryExecution.optimizedPlan.toString.contains("__band"))
    // plain theta (no abs form): untouched
    val theta = lf.join(rf, col("lt") < col("rt"))
    assert(!theta.queryExecution.optimizedPlan.toString.contains("__band"))
  }

  test("register is idempotent (one rule instance)") {
    val fresh = spark.newSession()
    graft.GraftExtensions.register(fresh)
    graft.GraftExtensions.register(fresh)
    assert(fresh.experimental.extraOptimizations
      .count(_ == BandedIntervalJoin) == 1)
  }
}
