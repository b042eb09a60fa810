package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec
import graft.core.Notify
import graft.streaming.Reconciler._
import graft.warehouse.ParquetCatalog

/** The WHOLE O1 story live: the reconcile loop's decisions start a real
  * reload streaming query, the realtime signal comes from the actual
  * [[RealtimeTracker]] listener watching that query's progress, and the
  * release decision performs the catalog's D7 swap — control plane and
  * data plane composed, no mocks in the loop. */
class ReconcileLoopLiveSpec extends SparkSpec {
  import spark.implicits._

  test("rollout driven by live stream progress and lag tracking") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("liveloop").toString
    val cat = new ParquetCatalog(spark, root)
    val desired = "f00dfeedcafe"
    val suffix = reloadSuffix(desired)

    // the live table, serving mask-version v1
    cat.save("s", "users",
      Seq((1L, "MASKED-OLD")).toDF("id", "name"))

    val tracker = new RealtimeTracker(maxLagRows = 100)
    spark.streams.addListener(tracker)
    val mem = MemoryStream[(Long, String)]
    var reloadQuery: Option[StreamingQuery] = None
    val buf = new Notify.Buffer

    def observe(st: SinkStatus): Observed = Observed(
      allTopics = Seq("users"),
      desiredVersion = desired,
      // mask diff: users differs until the fleet is live on desired
      diffTopics =
        if (st.currentVersion.contains(desired)) Set.empty
        else Set("users"),
      // O4: the REAL lag signal from the running reload query
      realtimeNow =
        if (tracker.realtime("reload-users")) Set("users") else Set.empty)

    def execute(d: Decision): Unit = {
      // reload group wanted and not yet running → start the v2 rebuild
      if (d.groups.reload.contains("users") && reloadQuery.isEmpty)
        reloadQuery = Some(
          mem.toDF().toDF("id", "name")
            .writeStream.queryName("reload-users")
            .option("checkpointLocation", s"$root/ck")
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              cat.append("s", "users" + suffix, b)
            }.start())
      d.release.foreach(t => cat.release("s", t, suffix))
      d.notifications.foreach(buf.notify)
    }

    var status = SinkStatus(Some("v1"),
      Map("users" -> TopicStatus(Active, "v1", releasedEver = true)))
    def tick(): Decision = {
      val d = Reconciler.step(status, observe(status), "sink",
        "org/masks", "masks.yaml")
      execute(d)
      status = d.status
      d
    }

    try {
      val d0 = tick() // sees the diff → reload (+dupe) groups, starts query
      assert(d0.groups.reload == Seq("users"))
      assert(d0.groups.reloadDupe == Seq("users")) // old table stays live
      assert(reloadQuery.nonEmpty)
      assert(d0.requeueMillis == RequeueReloading)
      assert(!tracker.realtime("reload-users")) // no progress yet

      // backfill flows; the query catches up → tracker flips realtime.
      // The listener bus is asynchronous: progress events deliver on a
      // listener thread after processAllAvailable returns, so poll.
      mem.addData((1L, "clear-new"), (2L, "clear-extra"))
      reloadQuery.get.processAllAvailable()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!tracker.realtime("reload-users") &&
        System.nanoTime() < deadline) Thread.sleep(50)
      assert(tracker.realtime("reload-users"))

      val d1 = tick() // promotion, fast requeue
      assert(d1.requeueMillis == RequeueRealtime)
      assert(d1.status.phaseOf("users").contains(Realtime))

      val d2 = tick() // release: D7 swap runs against the real catalog
      assert(d2.release == Seq("users"))
      assert(status.currentVersion.contains(desired))
      assert(cat.load("s", "users").select("name")
        .as[String].collect().toSet == Set("clear-new", "clear-extra"))
      assert(!cat.exists("s", "users" + suffix))
      assert(buf.messages.exists(_.contains("Released table")))
      assert(buf.messages.exists(_.contains(Notify.shortSha(desired))))

      val d3 = tick() // converged fleet idles at the long requeue
      assert(d3.requeueMillis == RequeueIdle)
    } finally {
      reloadQuery.foreach(_.stop())
      spark.streams.removeListener(tracker)
    }
  }
}
