package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Throughput probe for [[graft.streaming.SubstrDedupStream]] — the
  * Bench section's shape (documents + shared boilerplate tail, 5
  * batches) without the MemoryStream scaffolding, plus an optional
  * per-job listener (`SUBSTR_JOBS=1`), so trigger-floor A/Bs isolate
  * the foreachBatch body.
  *
  * Usage: `runMain graft.tools.SubstrStreamBench <sfDir> [batches]` */
object SubstrStreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nB = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    if (sys.env.contains("SUBSTR_JOBS")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            scala.collection.concurrent.TrieMap[Int, Long]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts(j.jobId) = System.nanoTime()
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            starts.remove(j.jobId).foreach { t =>
              System.err.println(
                f"[job] id=${j.jobId} wall=${(System.nanoTime() - t) / 1e9}%.3f")
            }
        })
    }
    // SUBSTR_PHASES=1: per-action Catalyst phase attribution — turns
    // the "wall − jobs gap is driver plan work" inference into named
    // milliseconds (analysis / optimization / planning per executed
    // query), the number VERDICT r16 #7 asked the reassembly-caching
    // idea to be judged against
    if (sys.env.contains("SUBSTR_PHASES")) {
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val ph = qe.tracker.phases.toSeq.sortBy(_._1)
              .map { case (k, v) => s"$k=${v.durationMs}ms" }
              .mkString(",")
            System.err.println(
              f"[qe] $funcName wall=${durationNs / 1e9}%.3f $ph")
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_substrprobe").toString
    val docsAll = graft.Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          lit(" subscribe to our newsletter for updates and special" +
            " offers today")).as("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val per = math.max(1, docsAll.length / nB)
    val batches = docsAll.grouped(per).toSeq
    val s = new graft.streaming.SubstrDedupStream(spark, dir + "/keys",
      "doc_id", "text", n = 8, storeBuckets =
        sys.env.getOrElse("SPARK_GRAFT_STORE_BUCKETS", "64").toInt)
    // SUBSTR_OVERLAP=0: sequential tail (append, then write) — the A/B
    // baseline for the r19 overlapped default, where the output write
    // and the corpus append submit concurrently
    val overlap = !sys.env.get("SUBSTR_OVERLAP").contains("0")
    val t0 = System.nanoTime()
    batches.zipWithIndex.foreach { case (b, i) =>
      val tb = System.nanoTime()
      def write(out: org.apache.spark.sql.DataFrame): Unit = out.write
        .mode(SaveMode.Append).parquet(dir + "/out")
      if (overlap)
        s.processBatch(b.toSeq.toDF("doc_id", "text"), i.toLong, write)
      else
        write(s.processBatch(b.toSeq.toDF("doc_id", "text"), i.toLong))
      graft.core.Metrics.drainUnpersist()
      println(f"  batch $i wall=${(System.nanoTime() - tb) / 1e9}%.2f")
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val (nb, kept, dropped) = s.stats
    println(f"SUBSTRPROBE batches=$nb docs=${docsAll.length} " +
      f"sec=$sec%.2f docs_per_sec=${docsAll.length / sec}%.0f " +
      f"kept=$kept dropped=$dropped")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir))
    spark.stop()
  }
}
