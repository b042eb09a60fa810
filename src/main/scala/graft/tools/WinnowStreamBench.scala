package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput + hit-rate measurement for [[graft.streaming.WinnowQuoteStream]]
  * — the evidence row behind "quote detection at ingest": drives the
  * real documents table through the stream in `triggers` micro-batches
  * (docs routed by doc_id % triggers, so near-dup/quote pairs from the
  * corpus generator genuinely straddle batches), with cadenced
  * compaction, and reports per-trigger wall, docs/s, pairs emitted,
  * and final store size.
  *
  * Usage: `runMain graft.tools.WinnowStreamBench <sfDir> [triggers]` */
object WinnowStreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nTriggers = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-winnow-stream-bench")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val nDocs = docs.count()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_stream").toString
    val s = new graft.streaming.WinnowQuoteStream(spark, dir + "/fps",
      "doc_id", "text", k = 3, w = 4, minShared = 2L, compactEvery = 4,
      storeBuckets =
        sys.env.getOrElse("SPARK_GRAFT_STORE_BUCKETS", "64").toInt)

    if (sys.env.contains("WINNOW_JOBS")) {
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
    var totalSec = 0.0
    var totalPairs = 0L
    (0 until nTriggers).foreach { b =>
      val batch = docs.filter(pmod(col("doc_id"), lit(nTriggers)) === b)
      val t0 = System.nanoTime()
      val pairs = s.processBatch(batch, b.toLong).count()
      graft.core.Metrics.drainUnpersist()
      val sec = (System.nanoTime() - t0) / 1e9
      totalSec += sec; totalPairs += pairs
      println(f"trigger=$b%d wall=$sec%.3f pairs=$pairs%d")
    }
    // through the store API: the raw root read misses the hidden
    // _delta leg of the two-tier layout
    val storeRows = new graft.streaming.StreamStore(spark, dir + "/fps")
      .visible(Long.MaxValue).map(_.count()).getOrElse(0L)
    println(f"WINNOW_STREAM docs=$nDocs%d triggers=$nTriggers%d " +
      f"total_sec=$totalSec%.2f docs_per_sec=${nDocs / totalSec}%.1f " +
      f"pairs=$totalPairs%d store_fps=$storeRows%d")
    spark.stop()
  }
}
