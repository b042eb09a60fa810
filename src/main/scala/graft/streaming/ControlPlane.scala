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
}
