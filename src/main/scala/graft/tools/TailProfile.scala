package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage attribution for the 0.3–0.5 s catalog tail
  * (VERDICT r19 #4): is a tail query's wall compute, or the driver's
  * job-scheduling / AQE-round-trip floor? For each named query it runs
  * warm executions and reports, per run:
  *   - `jobs` / `stages`: how many driver round-trips the query pays
  *     (each AQE shuffle-stage materialization is its own job),
  *   - `jobs_wall`: the union of job [start, end] intervals — time at
  *     least one job was in flight,
  *   - `gap`: run wall minus jobs_wall — driver-side think time
  *     (planning, AQE re-optimization, action glue) with ZERO jobs in
  *     flight; the pure scheduling floor,
  *   - `task_sec`: summed executor task time (the compute actually
  *     done, across all cores).
  * A query with small task_sec, several jobs and gap ≈ wall is
  * scheduling-floor-bound: no operator change helps, only fewer
  * round-trips. Usage:
  * `runMain graft.tools.TailProfile <sfDir> <q1,q2,...> [runs]` */
object TailProfile {
  final class JobWindows extends SparkListener {
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(js: SparkListenerJobStart): Unit =
      jobs.put(js.jobId, Array(js.time, -1L))
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      val w = jobs.get(je.jobId)
      if (w != null) w(1) = je.time
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      taskMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      ()
    }
    def reset(): Unit = { jobs.clear(); stages.set(0); taskMs.set(0L) }
    /** Total ms during which >=1 job was live (interval union). */
    def jobsWallMs(): Long = {
      import scala.jdk.CollectionConverters._
      val iv = jobs.values.asScala.toSeq.filter(_(1) > 0)
        .map(w => (w(0), w(1))).sortBy(_._1)
      var acc = 0L; var curS = -1L; var curE = -1L
      iv.foreach { case (s, e) =>
        if (curE < 0) { curS = s; curE = e }
        else if (s <= curE) curE = math.max(curE, e)
        else { acc += curE - curS; curS = s; curE = e }
      }
      if (curE > 0) acc += curE - curS
      acc
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val nRuns = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // mirrors graft.Bench's session config (the QueryBench rule)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-tailprofile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.IndexStore.minhashSigs(spark, sfDir)
    catch { case _: Throwable => () }
    try graft.IndexStore.dsirRatios(spark, sfDir)
    catch { case _: Throwable => () }
    try graft.IndexStore.annIvf(spark, sfDir)
    catch { case _: Throwable => () }
    try graft.IndexStore.annIvfPq(spark, sfDir)
    catch { case _: Throwable => () }
    val lst = new JobWindows
    spark.sparkContext.addSparkListener(lst)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm-up (codegen/JIT) — not profiled
      (1 to 2).foreach { _ =>
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        graft.core.Metrics.drainUnpersist()
      }
      (1 to nRuns).foreach { i =>
        lst.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        graft.core.Metrics.drainUnpersist()
        org.apache.spark.sql.graft.Shims.waitListenerBus(spark, 10000L)
        val jw = lst.jobsWallMs() / 1e3
        println(f"[tail] $name%-24s run$i wall=$wall%.3f " +
          f"jobs=${lst.jobs.size}%-3d stages=${lst.stages.get}%-3d " +
          f"jobs_wall=$jw%.3f gap=${math.max(0.0, wall - jw)}%.3f " +
          f"task_sec=${lst.taskMs.get / 1e3}%.3f")
      }
    }
    spark.stop()
  }
}
