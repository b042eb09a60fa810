package graft.streaming

import graft.core.{Notifier, Notify}

/** O1 — the reconcile loop (tipoca-stream
  * controllers/redshiftsink_controller.go:329–651): the one control-plane
  * piece SURVEY §2.7 left unported. The reference runs it as a K8s
  * controller; here it is the same decision procedure with the K8s and
  * Kafka boundaries factored out behind [[Reconciler.Observed]] — a PURE
  * step function `(status, observation) → Decision`, so one reconcile is
  * deterministic, unit-testable, and driver-side O(topics) (the data path
  * stays entirely in the streaming queries the decision starts/stops).
  *
  * Each step mirrors the reference's phases:
  *  1. partition topics into released / realtime / reloading / reloadingDupe
  *     (controllers/status.go:91–202) from the persisted per-topic phase
  *     plus the mask diff;
  *  2. promote topics the lag probe says are caught up to Realtime and
  *     requeue fast (1.5 s — redshiftsink_controller.go:489);
  *  3. emit the three sink groups to run — main (released @ desired,
  *     live tables), reload (@ desired, into `<table>_reload_<sha6>`),
  *     reloadDupe (@ current, keeping the live table fresh while its
  *     replacement backfills) (redshiftsink_controller.go:494–548);
  *  4. release ≤ [[Reconciler.MaxTopicRelease]] realtime topics per step
  *     (the rebalance-batching optimization, #141) with per-topic and
  *     fleet-complete notifications (pkg/notify/notify.go:24–36);
  *  5. requeue: 1.5 s after realtime promotion, 15 s while reloads are
  *     in flight, 900 s when idle (redshiftsink_controller.go:565–576).
  *
  * The caller persists [[Reconciler.SinkStatus]] (the reference stores it
  * in the CRD status) and supplies the observation — topics from
  * discovery (S9 `subscribePattern`), desired version from
  * [[graft.mask.GitMaskStore]], the diff from [[graft.mask.MaskDiff]],
  * and realtime facts from [[RealtimeTracker]]. [[ReconcileLoop]] drives
  * step → execute → requeue to convergence.
  */
object Reconciler {

  /** Per-topic lifecycle phase (api/v1/redshiftsink_types.go MaskPhase). */
  sealed abstract class Phase(val name: String)
  /** Backfilling into the `_reload_<sha6>` shadow table. */
  case object Reloading extends Phase("Reloading")
  /** Shadow table caught up with the stream head; eligible for release. */
  case object Realtime extends Phase("Realtime")
  /** Live on `version` (released, serving the main table). */
  case object Active extends Phase("Active")

  /** `releasedEver` decides whether a reload needs a dupe group keeping
    * the OLD live table fresh during backfill (status.go:183–202): a
    * brand-new topic has no live table to protect. */
  final case class TopicStatus(
      phase: Phase,
      version: String,
      releasedEver: Boolean)

  /** The persisted controller state (the CRD `.status` analogue). */
  final case class SinkStatus(
      currentVersion: Option[String],
      topics: Map[String, TopicStatus]) {
    def phaseOf(t: String): Option[Phase] = topics.get(t).map(_.phase)
  }
  object SinkStatus {
    val empty: SinkStatus = SinkStatus(None, Map.empty)
  }

  /** One observation of the world — everything the reference fetches at
    * the top of `reconcile` (topics via regex, git mask head, mask diff,
    * consumer-group lag), gathered by the caller so the step stays pure.
    *
    * @param diffTopics   topics whose masking changed current→desired
    *                     ([[graft.mask.MaskDiff.changedTables]])
    * @param realtimeNow  reloading topics whose shadow query is caught up
    *                     ([[RealtimeTracker.realtime]])
    */
  final case class Observed(
      allTopics: Seq[String],
      desiredVersion: String,
      diffTopics: Set[String],
      realtimeNow: Set[String])

  /** The three sink groups one reconcile runs
    * (redshiftsink_controller.go:477–507). */
  final case class SinkGroups(
      main: Seq[String],
      reload: Seq[String],
      reloadDupe: Seq[String])

  /** What one step decided: the status to persist, the groups to have
    * running, the topics to release NOW (≤ MaxTopicRelease), the
    * notifications to send, and when to reconcile again. */
  final case class Decision(
      status: SinkStatus,
      groups: SinkGroups,
      release: Seq[String],
      notifications: Seq[String],
      requeueMillis: Long)

  /** ≤ this many releases per reconcile, so sink-group rebalances batch
    * (redshiftsink_controller.go:75–77, issue #141). */
  val MaxTopicRelease = 5

  val RequeueRealtime = 1500L
  val RequeueReleased = 30000L
  val RequeueReloading = 15000L
  val RequeueIdle = 900000L

  /** Shadow-table suffix for a desired version
    * (`_reload_` + short sha, transformer.go ReloadTableSuffix). */
  def reloadSuffix(desiredVersion: String): String =
    "_reload_" + Notify.shortSha(desiredVersion)

  /** One pure reconcile step. `repo`/`filePath` only feed the
    * notification links (Notify O6). */
  def step(status: SinkStatus, obs: Observed, name: String = "sink",
      repo: String = "", filePath: String = ""): Decision = {
    val desired = obs.desiredVersion
    val current = status.currentVersion.getOrElse("")

    // -- 1. partition (status.go:91–202) ------------------------------
    // Released: Active@desired, plus Active@any-version topics the diff
    // does not touch (they need no reload to be correct under desired).
    val released = obs.allTopics.filter { t =>
      status.topics.get(t).exists(s => s.phase == Active &&
        (s.version == desired || !obs.diffTopics(t)))
    }.sorted
    val releasedSet = released.toSet

    // Realtime: promoted in a previous step, not yet released.
    val realtimePrev = obs.allTopics.filter(t =>
      status.topics.get(t).exists(s =>
        s.phase == Realtime && s.version == desired)).sorted

    // Reloading: diff topics not yet released/realtime, plus topics new
    // to the status (first sight ⇒ full backfill), plus topics already
    // mid-reload (crash recovery).
    val reloading = obs.allTopics.filter { t =>
      val st = status.topics.get(t)
      val inDiff = obs.diffTopics(t) && !releasedSet(t) &&
        !realtimePrev.contains(t)
      st.isEmpty || st.exists(_.phase == Reloading) || inDiff
    }.sorted

    // Inconsistent persisted state (no diff yet topics stuck Reloading
    // after e.g. a status rollback): self-heal to Active@desired
    // (redshiftsink_controller.go:459–470 fixMaskStatus).
    if (obs.diffTopics.isEmpty && current == desired && reloading.nonEmpty &&
      reloading.forall(t => status.topics.contains(t))) {
      val healed = reloading.foldLeft(status.topics)((m, t) =>
        m.updated(t, m(t).copy(phase = Active, version = desired)))
      return Decision(
        status.copy(topics = healed),
        SinkGroups(obs.allTopics.sorted, Nil, Nil),
        Nil, Nil, RequeueReleased)
    }

    // Realtime topics stay in the reload/dupe groups until RELEASED:
    // their shadow query must keep consuming (or they fall behind and
    // lose realtime before their release batch arrives — fleets larger
    // than MaxTopicRelease wait extra cycles) and their dupe keeps the
    // live table fresh in the meantime.
    val running = (reloading ++ realtimePrev).sorted
    val reloadingDupe =
      running.filter(t => status.topics.get(t).exists(_.releasedEver))

    // First sight of a topic: record it Reloading@desired so the next
    // step (and a restart) sees the same partition.
    val topics0 = reloading.foldLeft(status.topics)((m, t) =>
      if (m.contains(t)) m
      else m.updated(t, TopicStatus(Reloading, desired, releasedEver = false)))

    val groups = SinkGroups(released, running, reloadingDupe)

    // -- 2. realtime promotion (controller:473–491) --------------------
    val newlyRealtime = reloading.filter(obs.realtimeNow).sorted
    if (newlyRealtime.nonEmpty) {
      val promoted = newlyRealtime.foldLeft(topics0)((m, t) =>
        m.updated(t, m(t).copy(phase = Realtime, version = desired)))
      return Decision(status.copy(topics = promoted), groups, Nil, Nil,
        RequeueRealtime)
    }

    // -- 3. nothing realtime: keep groups running ----------------------
    if (realtimePrev.isEmpty) {
      val requeue = if (reloading.nonEmpty) RequeueReloading else RequeueIdle
      return Decision(status.copy(topics = topics0), groups, Nil, Nil,
        requeue)
    }

    // -- 4. release a batch (controller:578–645) -----------------------
    val toRelease = ControlPlane.releaseBatch(realtimePrev, MaxTopicRelease)
    val releasedTopics = toRelease.foldLeft(topics0)((m, t) =>
      m.updated(t, TopicStatus(Active, desired, releasedEver = true)))
    // this step's groups must not include the topics it releases: the
    // dupe query would append OLD-mask rows into the just-swapped live
    // table for a whole requeue interval, and the reload query would
    // resurrect an orphan _reload_ table after the swap consumed it
    val releaseGroups = SinkGroups(
      (released ++ toRelease).sorted,
      running.diff(toRelease),
      reloadingDupe.diff(toRelease))

    val perTopic = toRelease.map(t =>
      Notify.topicRelease(name, t, repo, filePath, current, desired))

    // Post-release accounting for the fleet-complete gate
    // (status.go:443–460): every topic Active@desired ⇒ flip
    // currentVersion and (when it actually changed) announce.
    val allActive = obs.allTopics.forall(t =>
      releasedTopics.get(t).exists(s =>
        s.phase == Active && (s.version == desired || !obs.diffTopics(t))))
    val fleetDone = allActive && reloading.isEmpty &&
      realtimePrev.forall(toRelease.contains)
    val fleet =
      if (fleetDone)
        Notify.releaseAll(name, obs.allTopics.size,
          obs.allTopics.size, 0, 0, repo, filePath, current, desired).toSeq
      else Nil

    val nextVersion =
      if (fleetDone) Some(desired) else status.currentVersion

    Decision(
      SinkStatus(nextVersion, releasedTopics),
      releaseGroups, toRelease, perTopic ++ fleet, RequeueReleased)
  }
}

/** Drives [[Reconciler.step]] to convergence: observe → decide → execute
  * → (virtually) requeue. The executor receives each decision and is
  * responsible for the real side effects — (re)starting the sink-group
  * queries and performing the D7 release swap
  * ([[graft.warehouse.ParquetCatalog.release]]) for `decision.release`.
  * Requeue delays are returned, not slept — the unit under test is the
  * decision sequence, and a deployment wires the timer. */
final class ReconcileLoop(
    observe: Reconciler.SinkStatus => Reconciler.Observed,
    execute: Reconciler.Decision => Unit,
    notifier: Notifier = Notify.Noop,
    name: String = "sink",
    repo: String = "",
    filePath: String = "") {

  /** Steps until the idle requeue (or `maxSteps`); returns the final
    * status and every decision taken, in order. */
  def run(start: Reconciler.SinkStatus = Reconciler.SinkStatus.empty,
      maxSteps: Int = 100): (Reconciler.SinkStatus, Seq[Reconciler.Decision]) = {
    var status = start
    val decisions = Seq.newBuilder[Reconciler.Decision]
    var steps = 0
    var idle = false
    while (!idle && steps < maxSteps) {
      val d = Reconciler.step(status, observe(status), name, repo, filePath)
      execute(d)
      d.notifications.foreach(notifier.notify)
      decisions += d
      status = d.status
      idle = d.requeueMillis == Reconciler.RequeueIdle
      steps += 1
    }
    (status, decisions.result())
  }
}
