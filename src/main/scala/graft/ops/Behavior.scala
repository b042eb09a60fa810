package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Event-behavior analytics over the CDC-landed event stream: cohort
  * retention, ordered funnels, and per-group time-series anomaly flags.
  * The reference's sink feeds exactly these warehouse queries (the
  * tipoca README's "analysts query the loaded tables" story); here they
  * are first-class operators with oracle-checked semantics.
  *
  * Scale shape: each operator is one user-keyed shuffle (window
  * functions reuse the partitioning across chained frames) plus a
  * small-cardinality hash aggregate — no joins against the event stream,
  * no driver-side state. At 100 TB the user partitioning is the natural
  * key (AQE splits skewed power users only if a single user's history
  * exceeds a partition, which the window frame tolerates).
  */
object Behavior {

  /** Classic cohort-retention triangle: bucket each user by the day they
    * were first seen, then count distinct active users per
    * (cohort day, days-since-cohort offset).
    *
    * One shuffle on `userCol` computes the per-user first day as a
    * window min (no join back — the window reuses the shuffle); the
    * (cohort, offset) aggregate that follows is tiny (days × days).
    */
  def cohortRetention(events: DataFrame, userCol: String,
      dayCol: String): DataFrame = {
    val w = Window.partitionBy(userCol)
    events
      .withColumn("cohort_day", min(col(dayCol)).over(w))
      .groupBy(col("cohort_day"),
        datediff(col(dayCol), col("cohort_day")).cast(LongType)
          .as("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Ordered conversion funnel: for each user, stage i's timestamp is the
    * earliest `stages(i)` event at-or-after the user's stage i−1
    * timestamp; a user "reaches" stage i when that timestamp exists.
    * Returns ONE row with a `n_stage<i>` distinct-user count per stage.
    *
    * Each stage is a conditional window-min over the same user
    * partitioning — Spark plans the chain as consecutive Window execs on
    * one exchange (stage i's predicate references stage i−1's column,
    * which is partition-constant, so no extra pass over the data is
    * needed beyond the frame evaluation).
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(userCol)
    val staged = stages.zipWithIndex.foldLeft(events) {
      case (df, (stage, i)) =>
        val cond =
          if (i == 0) col(typeCol) === stage
          else col(typeCol) === stage && col(tsCol) >= col(s"t${i - 1}")
        df.withColumn(s"t$i", min(when(cond, col(tsCol))).over(w))
    }
    // Reduce to ONE row per user before counting: each t_i is a
    // full-partition window value, i.e. constant per user, so max()
    // recovers it exactly — and the final counts become plain counts
    // over user rows. The direct form (N countDistinct over different
    // when() args) plans an Expand that pushes |stages|+1 copies of
    // EVERY event row through the aggregate — the multi-distinct trap
    // CatalogPlanInvariantsSpec now gates. The groupBy reuses the
    // window's hashpartitioning(user), so no extra shuffle.
    val perUser = staged.groupBy(col(userCol)).agg(
      max(col("t0")).as("t0"),
      stages.indices.drop(1).map(i => max(col(s"t$i")).as(s"t$i")): _*)
    val counts: Seq[Column] = stages.indices.map(i =>
      count(when(col(s"t$i").isNotNull, lit(1))).as(s"n_stage${i + 1}"))
    perUser.agg(counts.head, counts.tail: _*)
  }

  /** Exponentially time-decayed counts per group — the trending score:
    * each event weighs 2^(−age div halfLifeDays), age in whole days
    * before `refDay` (events after `refDay` excluded; decay exponents
    * cap at 40 ≈ weight 10^−12, below observability).
    *
    * Exactness discipline: the aggregate sums SCALED INTEGER weights
    * 2^(40 − e) — a float-dyadic sum would lose exactness once the
    * exponent spread passes the 52-bit mantissa, making the total
    * order-dependent — and the one double division by 2^40 happens on
    * the final per-group scalar, so any engine replays the score
    * bit-for-bit (headroom: ~2^22 events per group before BIGINT
    * overflow at the scale cap — partition hot groups beyond that).
    * One partial-aggregated group count; the weight computes map-side,
    * nothing shuffles but the per-group partials. */
  def decayedCounts(events: DataFrame, groupCols: Seq[String],
      dayCol: String, refDay: Column, halfLifeDays: Int): DataFrame = {
    require(halfLifeDays > 0, "halfLifeDays must be positive")
    val MaxE = 40
    val age = datediff(refDay, col(dayCol))
    val e = least((age.cast("double") / halfLifeDays).cast(LongType),
      lit(MaxE.toLong))
    events.filter(age >= 0)
      .withColumn("__e", e)
      .withColumn("__scaled", expr(
        s"shiftleft(CAST(1 AS BIGINT), CAST($MaxE - __e AS INT))"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        (sum(col("__scaled")).cast("double") /
          lit(math.pow(2.0, MaxE))).as("decayed_count"))
  }

  /** [[decayedCounts]] over an ALREADY-AGGREGATED daily table (`nCol`
    * events per group×day) — the streaming tail: a daily rollup
    * ([[graft.streaming.DailyRollup]]) maintains the per-day counts
    * incrementally; this scores the tiny days×groups table. EXACTLY
    * equal to decayedCounts over the raw events (the weight is constant
    * within a day, so per-day pre-aggregation commutes with the scaled
    * integer sum — spec-pinned). */
  def decayedFromDaily(daily: DataFrame, groupCols: Seq[String],
      dayCol: String, nCol: String, refDay: Column,
      halfLifeDays: Int): DataFrame = {
    require(halfLifeDays > 0, "halfLifeDays must be positive")
    val MaxE = 40
    val age = datediff(refDay, col(dayCol))
    val e = least((age.cast("double") / halfLifeDays).cast(LongType),
      lit(MaxE.toLong))
    daily.filter(age >= 0)
      .withColumn("__e", e)
      .withColumn("__scaled", expr(
        s"CAST($nCol AS BIGINT) * " +
          s"shiftleft(CAST(1 AS BIGINT), CAST($MaxE - __e AS INT))"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col(nCol).cast(LongType)).as("n_events"),
        (sum(col("__scaled")).cast("double") /
          lit(math.pow(2.0, MaxE))).as("decayed_count"))
  }

  /** Per-group daily anomaly flags: sum `valueCol` per (group, day),
    * z-score each day against its group's mean/stddev across days, and
    * flag |z| ≥ `threshold`. The flag compares the ROUNDED z (4 dp) so
    * the decision replays identically on any engine — a raw
    * floating-point boundary would let two correct engines disagree on
    * the flag while agreeing on every printed digit.
    *
    * The heavy step is the (group, day) partial-aggregated sum — the
    * stream never shuffles twice; the z-score window runs over the tiny
    * daily table.
    */
  def dailyAnomalies(events: DataFrame, groupCols: Seq[String],
      dayCol: String, valueCol: String,
      threshold: Double = 2.0): DataFrame = {
    val daily = events.groupBy((groupCols :+ dayCol).map(col): _*)
      .agg(sum(col(valueCol)).as("day_value"))
    dailyAnomaliesFromDaily(daily, groupCols, dayCol, threshold)
  }

  /** The z-score pass over an ALREADY-AGGREGATED daily table
    * (`day_value` per group×day) — the batch tail of the streaming
    * rollup ([[graft.streaming.DailyRollup]] maintains the table; this
    * scores it). Degenerate groups — a single day (stddev_samp NULL) or
    * zero variance (0/0 → NaN) — score z = 0.0 / is_anomaly = false, so
    * the flag column is a real boolean downstream filters can trust
    * rather than a NULL/NaN three-valued one. */
  def dailyAnomaliesFromDaily(daily: DataFrame, groupCols: Seq[String],
      dayCol: String, threshold: Double = 2.0): DataFrame = {
    val gs = groupCols.map(col)
    val w = Window.partitionBy(gs: _*)
    val sd = stddev_samp(col("day_value")).over(w)
    daily
      .withColumn("z", when(sd.isNull || sd === 0.0, lit(0.0))
        .otherwise((col("day_value") - avg("day_value").over(w)) / sd))
      .select(gs ++ Seq(col(dayCol),
        round(col("day_value"), 4).as("day_value"),
        round(col("z"), 4).as("z"),
        (abs(round(col("z"), 4)) >= threshold).as("is_anomaly")): _*)
  }
}
