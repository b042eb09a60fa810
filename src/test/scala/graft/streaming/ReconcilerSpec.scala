package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Notify
import graft.streaming.Reconciler._

/** O1 reconcile loop (controllers/redshiftsink_controller.go:329–651):
  * the decision sequence a sink goes through from first deploy to a
  * mask-version rollout, phase by phase, plus a live run where the
  * loop's release decisions drive real ParquetCatalog D7 swaps. */
class ReconcilerSpec extends SparkSpec {

  private val topics = Seq("t_a", "t_b", "t_c", "t_d", "t_e", "t_f", "t_g")

  private def obs(desired: String, diff: Set[String], rt: Set[String]) =
    Observed(topics, desired, diff, rt)

  test("first deploy: everything reloads, nothing released") {
    val d = step(SinkStatus.empty, obs("v1", topics.toSet, Set.empty))
    assert(d.groups.reload == topics.sorted)
    assert(d.groups.main.isEmpty && d.groups.reloadDupe.isEmpty)
    assert(d.release.isEmpty)
    assert(d.requeueMillis == RequeueReloading)
    assert(d.status.topics.values.forall(s =>
      s.phase == Reloading && s.version == "v1" && !s.releasedEver))
  }

  test("realtime promotion requeues fast, release follows next step") {
    val d0 = step(SinkStatus.empty, obs("v1", topics.toSet, Set.empty))
    val d1 = step(d0.status, obs("v1", topics.toSet, Set("t_b", "t_d")))
    assert(d1.requeueMillis == RequeueRealtime)
    assert(d1.release.isEmpty)
    assert(d1.status.phaseOf("t_b").contains(Realtime))
    assert(d1.status.phaseOf("t_a").contains(Reloading))

    val d2 = step(d1.status, obs("v1", topics.toSet, Set("t_b", "t_d")))
    assert(d2.release == Seq("t_b", "t_d"))
    assert(d2.requeueMillis == RequeueReleased)
    assert(d2.status.phaseOf("t_b").contains(Active))
    assert(d2.status.topics("t_b").releasedEver)
    // fleet not complete: no version flip, no fleet notification
    assert(d2.status.currentVersion.isEmpty)
    assert(d2.notifications.size == 2)
  }

  test("release batches cap at MaxTopicRelease per reconcile") {
    val d0 = step(SinkStatus.empty, obs("v1", topics.toSet, Set.empty))
    val d1 = step(d0.status, obs("v1", topics.toSet, topics.toSet))
    val d2 = step(d1.status, obs("v1", topics.toSet, topics.toSet))
    assert(d2.release.size == MaxTopicRelease)
    val d3 = step(d2.status, obs("v1", topics.toSet, topics.toSet))
    assert(d3.release.size == topics.size - MaxTopicRelease)
    // last batch completes the fleet: version flips, fleet msg present
    assert(d3.status.currentVersion.contains("v1"))
    assert(d3.notifications.exists(_.contains("7 tables live")))
  }

  test("version rollout: only the diff reloads, dupe keeps old table live") {
    // converge on v1 first
    val loop = new ReconcileLoop(
      st => obs("v1", if (st.currentVersion.contains("v1")) Set.empty
                      else topics.toSet, topics.toSet),
      _ => ())
    val (v1, _) = loop.run()
    assert(v1.currentVersion.contains("v1"))

    // v2 changes masking for t_c only
    val d0 = step(v1, obs("v2", Set("t_c"), Set.empty))
    assert(d0.groups.reload == Seq("t_c"))
    assert(d0.groups.reloadDupe == Seq("t_c")) // released before ⇒ dupe
    assert(d0.groups.main == topics.filterNot(_ == "t_c").sorted)
    assert(d0.requeueMillis == RequeueReloading)

    val d1 = step(d0.status, obs("v2", Set("t_c"), Set("t_c")))
    val d2 = step(d1.status, obs("v2", Set("t_c"), Set("t_c")))
    assert(d2.release == Seq("t_c"))
    assert(d2.status.currentVersion.contains("v2"))
    assert(d2.notifications.exists(_.contains("mask-changes")))
  }

  test("new topic appears mid-life: reloads without a dupe group") {
    val loop = new ReconcileLoop(
      st => obs("v1", if (st.currentVersion.contains("v1")) Set.empty
                      else topics.toSet, topics.toSet),
      _ => ())
    val (v1, _) = loop.run()
    val withNew = Observed(topics :+ "t_new", "v1", Set.empty, Set.empty)
    val d = step(v1, withNew)
    assert(d.groups.reload == Seq("t_new"))
    assert(d.groups.reloadDupe.isEmpty) // never released ⇒ nothing to keep live
    assert(d.groups.main == topics.sorted)
  }

  test("realtime-but-unreleased topics keep their reload groups running") {
    val d0 = step(SinkStatus.empty, obs("v1", topics.toSet, Set.empty))
    val d1 = step(d0.status, obs("v1", topics.toSet, topics.toSet))
    // all 7 realtime; release caps at 5 — the 2 awaiting the next batch
    // stay in the reload group (their shadow keeps consuming), while
    // the 5 being released leave it THIS step (their swap consumes the
    // shadow table; a lingering reload query would resurrect it) and
    // join main instead
    val d2 = step(d1.status, obs("v1", topics.toSet, topics.toSet))
    assert(d2.release.size == MaxTopicRelease)
    assert(d2.groups.reload == topics.sorted.diff(d2.release))
    assert(d2.groups.main == d2.release.sorted)
    val d3 = step(d2.status, obs("v1", topics.toSet, topics.toSet))
    assert(d3.groups.reload.isEmpty)
    assert(d3.groups.main == topics.sorted)
  }

  test("inconsistent status self-heals: reloading with no diff goes active") {
    val stuck = SinkStatus(Some("v1"),
      topics.map(t => t -> TopicStatus(Reloading, "v1",
        releasedEver = true)).toMap)
    val d = step(stuck, obs("v1", Set.empty, Set.empty))
    assert(d.status.topics.values.forall(_.phase == Active))
    assert(d.groups.reload.isEmpty)
  }

  test("idle fleet requeues at the 900s backoff") {
    val loop = new ReconcileLoop(
      st => obs("v1", if (st.currentVersion.contains("v1")) Set.empty
                      else topics.toSet, topics.toSet),
      _ => ())
    val (_, ds) = loop.run()
    assert(ds.last.requeueMillis == RequeueIdle)
    assert(ds.last.release.isEmpty && ds.last.notifications.isEmpty)
  }

  test("live loop: release decisions drive real catalog D7 swaps") {
    import graft.warehouse.ParquetCatalog
    val root = Files.createTempDirectory("reconcile").toString
    val cat = new ParquetCatalog(spark, root)
    val suffix = reloadSuffix("v2abcdef")
    val live = Seq("t_a", "t_b")

    // current tables live on v1; shadow reload tables carry v2 data
    live.foreach { t =>
      cat.save("s", t, spark.range(10).select(col("id"), lit("v1").as("v")))
      cat.save("s", t + suffix,
        spark.range(10).select(col("id"), lit("v2").as("v")))
    }

    val buf = new Notify.Buffer
    val start = SinkStatus(Some("v1"),
      live.map(t => t -> TopicStatus(Reloading, "v2abcdef",
        releasedEver = true)).toMap)
    val loop = new ReconcileLoop(
      _ => Observed(live, "v2abcdef", live.toSet, live.toSet),
      d => d.release.foreach(t => cat.release("s", t, suffix)),
      notifier = buf, repo = "org/masks", filePath = "masks.yaml")
    val (end, _) = loop.run(start)

    assert(end.currentVersion.contains("v2abcdef"))
    live.foreach { t =>
      assert(col1[String](cat.load("s", t).select("v").distinct()) == Seq("v2"))
      assert(!cat.exists("s", t + suffix)) // shadow consumed by the swap
    }
    assert(buf.messages.count(_.contains("Released table")) == 2)
    assert(buf.messages.exists(_.contains("2 tables live")))
    assert(buf.messages.exists(_.contains(Notify.shortSha("v2abcdef"))))
  }
}
