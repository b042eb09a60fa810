package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  // user 1: events at 0, 10, 100 (gap 50) -> sessions {0,10}, {100}
  // user 2: single event
  private def events = Seq(
    (1L, 10L, 0L), (1L, 11L, 10L), (1L, 12L, 100L), (2L, 13L, 5L))
    .toDF("uid", "eid", "t")

  test("assign: session boundaries at gaps, 1-based ids, deterministic ties") {
    val got = Sessions.assign(events, "uid", "t", "eid", gapMicros = 50L)
      .select("eid", "sess_id").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 13L -> 1L))
  }

  test("stats: counts and bounds per session") {
    val got = Sessions.stats(events, "uid", "t", "eid", gapMicros = 50L)
      .select("uid", "sess_id", "n_events", "t_start", "t_end")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 2L, 0L, 10L), (1L, 2L, 1L, 100L, 100L),
      (2L, 1L, 1L, 5L, 5L)))
  }

  test("both windows share one Exchange (single key shuffle)") {
    val plan = Sessions.assign(events, "uid", "t", "eid", 50L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}

class AsOfPlanSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoin plans an equi-join on the band, never a cartesian product") {
    val l = Seq((1L, 5L)).toDF("lid", "lt")
    val r = Seq((2L, 7L)).toDF("rid", "rt")
    val plan = AsOf.rangeJoin(l, r, "lt", "rt", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
