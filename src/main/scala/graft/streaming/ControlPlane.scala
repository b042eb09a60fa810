package graft.streaming

import scala.util.Random

/** Control-plane scheduling helpers (SURVEY §2.7): the reference's
  * operator logic that survives as plain functions in a Spark deployment
  * (the rest — deployment reconciliation — is Kubernetes tooling, not
  * dataflow).
  */
object ControlPlane {

  /** T9 — randomized wait spreading (pkg/util Randomize; loader_handler.go:
    * 245-268): `base ± pct`, deterministic when a seed is given. Hot tables
    * get shorter waits, cold tables longer, so loads spread out instead of
    * thundering together. */
  def randomize(base: Long, pct: Double, seed: Option[Long] = None): Long = {
    val rnd = seed.map(new Random(_)).getOrElse(Random)
    val delta = (base * pct).toLong
    if (delta <= 0) base
    else base - delta + rnd.nextLong(2 * delta + 1)
  }

  /** O5/R10 — reload unit allocation (controllers/unit_allocator.go:
    * 58-174): reloading topics get one unit each, chosen by lowest last
    * offset (closest to done first), capped at `maxReloadingUnits`; the
    * rest wait. Returns (allocated, deferred). */
  def allocateReloadUnits(
      topicsByLastOffset: Seq[(String, Long)],
      maxReloadingUnits: Int): (Seq[String], Seq[String]) = {
    val sorted = topicsByLastOffset.sortBy { case (t, off) => (off, t) }
      .map(_._1)
    (sorted.take(maxReloadingUnits), sorted.drop(maxReloadingUnits))
  }

  /** R11 — chunked grouping (unit_allocator.go:176-216): split realtime
    * topics into fixed-size chunks, one consumer deployment per chunk. */
  def chunkTopics(topics: Seq[String], chunkSize: Int): Seq[Seq[String]] = {
    require(chunkSize > 0, "chunkSize must be positive")
    topics.grouped(chunkSize).map(_.toSeq).toSeq
  }

  /** O6 — release batching: at most `maxPerReconcile` tables released per
    * pass (redshiftsink_controller.go:75-77). */
  def releaseBatch[T](ready: Seq[T], maxPerReconcile: Int = 5): Seq[T] =
    ready.take(maxPerReconcile)

  // ---- T8: usage-aware load throttling (loader_handler.go:142-243) ----

  /** Concurrency watermark for merges: a new load is admitted while the
    * running count is AT OR BELOW this (reference semantics —
    * loader_handler.go:23,231 uses `<=`, so one more than the watermark
    * can briefly be in flight). */
  val MaxRunningLoaders = 10

  /** (max wait-checks, seconds between checks): how patiently a table's
    * load waits for a merge slot before barging in anyway. */
  final case class ThrottleBudget(maxChecks: Int, intervalSeconds: Int)

  /** Budget tiers from the reference (loader_handler.go:166-186): hot
    * (recently queried) tables on their first load wait longest — they're
    * worth scheduling well; hot re-loads only spread briefly; cold tables
    * back off with long intervals so they never crowd out hot ones.
    * `usageKnown=false` degrades to the metrics-disabled tiering. */
  def throttleBudget(
      queries: Double, firstLoad: Boolean,
      usageKnown: Boolean = true): ThrottleBudget =
    if (!usageKnown) {
      if (firstLoad) ThrottleBudget(120, 15) // 30 min max
      else ThrottleBudget(10, 15)            // 2.5 min max
    } else if (queries > 0 && firstLoad) ThrottleBudget(120, 15) // 30 min
    else if (queries > 0) ThrottleBudget(3, 10)                  // 30 s
    else if (firstLoad) ThrottleBudget(8, 900)                   // 2 h
    else ThrottleBudget(4, 900)                                  // 1 h

  /** Wait for a merge slot: poll `runningLoaders` every
    * `budget.intervalSeconds` until it drops to [[MaxRunningLoaders]] or
    * the budget is exhausted (then proceed anyway — the reference "go
    * load!"). Reload sink groups skip throttling entirely. Returns true
    * when a slot opened inside the budget. `sleep` is injectable for
    * deterministic tests. */
  def throttle(
      budget: ThrottleBudget,
      runningLoaders: () => Int,
      isReload: Boolean = false,
      sleep: Int => Unit = s => Thread.sleep(s * 1000L),
      table: String = "(untagged)"): Boolean = {
    if (isReload) return true
    var cnt = 0
    while (cnt < budget.maxChecks) {
      if (runningLoaders() <= MaxRunningLoaders) {
        // waited at least once → one throttle event (rsk_loader_throttled_total)
        if (cnt > 0) graft.core.Metrics.add(table, "loader_throttled_total", 1)
        return true
      }
      sleep(budget.intervalSeconds)
      cnt += 1
    }
    graft.core.Metrics.add(table, "loader_throttled_total", 1)
    false // budget exhausted: caller loads anyway
  }

  /** Usage-aware trigger wait (randomMaxWait, loader_handler.go:245-268):
    * hot tables trigger at most at `base`, cold tables at least at
    * `base` — each jittered ±pct so loads spread out. */
  def usageMaxWait(base: Long, queries: Double, pct: Double = 0.20,
      seed: Option[Long] = None): Long = {
    val r = randomize(base, pct, seed)
    if (queries > 0) math.min(r, base) else math.max(r, base)
  }
}
