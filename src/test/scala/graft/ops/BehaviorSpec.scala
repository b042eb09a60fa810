package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: stages must occur in order, per user") {
    // u1 completes a→b; u2 has b BEFORE a (b must not count); u3 only a;
    // u4 touches neither
    val ev = Seq(
      (1L, "a", 10L), (1L, "b", 20L),
      (2L, "b", 5L), (2L, "a", 10L),
      (3L, "a", 10L),
      (4L, "x", 10L)
    ).toDF("user_id", "event_type", "ts")
    val r = Behavior.funnel(ev, "user_id", "event_type", "ts",
      Seq("a", "b")).head()
    assert(r.getLong(0) == 3) // u1,u2,u3 reach a
    assert(r.getLong(1) == 1) // only u1 has b at-or-after a
  }

  test("funnel: same-timestamp stage counts (at-or-after)") {
    val ev = Seq((1L, "a", 10L), (1L, "b", 10L))
      .toDF("user_id", "event_type", "ts")
    val r = Behavior.funnel(ev, "user_id", "event_type", "ts",
      Seq("a", "b")).head()
    assert(r.getLong(1) == 1)
  }

  test("cohort retention counts distinct users per offset") {
    val ev = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-01"), (1L, "2024-01-03"),
      (2L, "2024-01-01"), (3L, "2024-01-02")
    ).toDF("user_id", "d").select(col("user_id"), to_date(col("d")).as("d"))
    val r = Behavior.cohortRetention(ev, "user_id", "d")
      .orderBy("cohort_day", "day_offset")
      .select(col("cohort_day").cast("string"), col("day_offset"),
        col("n_users"))
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("2024-01-01", 0L, 2L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L)))
  }

  test("anomaly flag decided on rounded z, one spike flagged") {
    val ev = (1 to 20).map(d => ("t", d, if (d == 7) 100.0 else 1.0))
      .toDF("k", "day", "v")
    val r = Behavior.dailyAnomalies(ev, Seq("k"), "day", "v",
      threshold = 2.0)
    val flagged = r.filter(col("is_anomaly")).select("day")
      .as[Int].collect().toSeq
    assert(flagged == Seq(7))
  }

  test("anomaly degenerate groups: single day / zero variance flag false") {
    val ev = Seq(
      ("solo", 1, 5.0),                 // single day: stddev_samp NULL
      ("flat", 1, 2.0), ("flat", 2, 2.0), ("flat", 3, 2.0) // zero variance
    ).toDF("k", "day", "v")
    val r = Behavior.dailyAnomalies(ev, Seq("k"), "day", "v")
      .select("k", "z", "is_anomaly").collect()
    assert(r.forall(row => !row.isNullAt(1) && row.getDouble(1) == 0.0),
      "z must be 0.0, not NULL/NaN, for degenerate groups")
    assert(r.forall(row => !row.isNullAt(2) && !row.getBoolean(2)),
      "is_anomaly must be false, not NULL, for degenerate groups")
  }

  test("decayedCounts: dyadic half-life weights, future events excluded, cap applies") {
    val ev = Seq(
      ("a", "2024-01-30"), ("a", "2024-01-30"),  // age 0  → 1.0 each
      ("a", "2024-01-23"),                       // age 7  → 0.5
      ("a", "2024-01-09"),                       // age 21 → 0.125
      ("a", "2024-02-01"),                       // future → excluded
      ("b", "2020-01-01"))                       // age ≫ cap → 2^-40
      .toDF("k", "d").select(col("k"), to_date(col("d")).as("day"))
    val got = Behavior.decayedCounts(ev, Seq("k"), "day",
      to_date(lit("2024-01-30")), halfLifeDays = 7)
      .as[(String, Long, Double)].collect().map(t => t._1 -> (t._2, t._3))
      .toMap
    assert(got("a") == ((4L, 2.625)))
    assert(got("b") == ((1L, 1.0 / (1L << 40).toDouble)))
  }

  test("decayedFromDaily == decayedCounts on raw events (pre-aggregation commutes)") {
    val rnd = new scala.util.Random(7)
    val ev = (1 to 300).map { _ =>
      (s"k${rnd.nextInt(4)}", f"2024-01-${1 + rnd.nextInt(30)}%02d")
    }.toDF("k", "d").select(col("k"), to_date(col("d")).as("day"))
    val ref = to_date(lit("2024-01-30"))
    val raw = Behavior.decayedCounts(ev, Seq("k"), "day", ref, 7)
      .as[(String, Long, Double)].collect().toSet
    val daily = ev.groupBy("k", "day")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val agg = Behavior.decayedFromDaily(daily, Seq("k"), "day", "n",
      ref, 7).as[(String, Long, Double)].collect().toSet
    assert(raw == agg, "per-day pre-aggregation must commute EXACTLY")
  }

  test("funnel plan: one exchange feeds the chained windows") {
    val ev = Seq((1L, "a", 10L)).toDF("user_id", "event_type", "ts")
    val plan = Behavior.funnel(ev, "user_id", "event_type", "ts",
      Seq("a", "b", "c")).queryExecution.executedPlan.toString
    // chained stage windows must not each re-shuffle on user_id
    val exchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 user_id exchange, plan:\n$plan")
  }
}
