package graft.tools

import org.apache.spark.sql.{SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Per-trigger cost AND state-memory residency vs ACCUMULATED STATE for
  * engine-managed against-all-history dedup ([[graft.streaming.StreamDedup
  * .againstHistoryStateful]]) on the two state-store providers — the
  * measurement behind "at ~1e9 keys move to RocksDB-backed state".
  * Measured finding (24 triggers × 200k keys, 3.6M keys final): per-trigger
  * WALL tracks the batch for BOTH providers (snapshots run on the
  * background maintenance thread, so they never land in trigger wall); the
  * divergence is `memoryUsedBytes` — the default (HDFS-backed) provider
  * holds every key version ON-HEAP and grows linearly with history, while
  * RocksDB holds keys on executor-local disk with a bounded block cache,
  * and changelog checkpointing commits only the trigger's delta. Batches
  * are 75% novel keys + 25% replays of old keys, so every trigger
  * exercises both the insert and the lookup path while state grows.
  *
  * Companion to [[StoreGrowth]], which measures the same growth shape
  * for the foreachBatch + StreamStore (queryable-table) alternative.
  *
  * Usage: `runMain graft.tools.StateBench [triggers] [keysPerBatch] [both|heap|rocks]`
  * (provider filter: at 10× the r12 key count the heap provider's
  * linear residency crosses executor OOM territory — `rocks` measures
  * the r13 DEFAULT provider alone at scales heap cannot complete). */
object StateBench {
  def main(args: Array[String]): Unit = {
    val nTriggers = if (args.length > 0) args(0).toInt else 24
    val perBatch = if (args.length > 1) args(1).toInt else 20000
    val providers = if (args.length > 2) args(2) else "both"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-state-bench")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(confs: Map[String, String], nTriggers: Int = nTriggers,
        perBatch: Int = perBatch): Seq[(Int, Long, Long, Double)] = {
      val s = spark.newSession()
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      implicit val ctx: SQLContext = s.sqlContext
      import ctx.sparkSession.implicits._
      val mem = MemoryStream[(Long, Long)]
      val q = graft.streaming.StreamDedup.againstHistoryStateful(
        mem.toDF().toDF("id", "k"), Seq("k"))
        .writeStream.outputMode(OutputMode.Append())
        .format("noop").start()
      try {
        val rnd = new scala.util.Random(7)
        var nextKey = 0L
        (0 until nTriggers).map { b =>
          val novel = (perBatch * 3) / 4
          val rows = (0 until perBatch).map { i =>
            val k = if (i < novel || nextKey == 0) { nextKey += 1; nextKey }
            else (math.abs(rnd.nextLong()) % nextKey) + 1
            (b.toLong * perBatch + i, k)
          }
          val t0 = System.nanoTime()
          mem.addData(rows)
          q.processAllAvailable()
          val wall = (System.nanoTime() - t0) / 1e9
          val op = q.lastProgress.stateOperators.head
          (b, op.numRowsTotal, op.memoryUsedBytes, wall)
        }
      } finally q.stop()
    }

    // one throwaway pass so JIT/classloading doesn't read as growth
    // (small — warm-up is JVM state, not provider state)
    run(Map.empty, nTriggers = 4, perBatch = math.min(perBatch, 20000))
    val heap = if (providers == "rocks") Seq.empty
      else run(Map.empty)
    val rocks = if (providers == "heap") Seq.empty
      else run(graft.GraftSession.rocksdbStateConfs)
    def fmt(rows: Seq[(Int, Long, Long, Double)]): String =
      rows.filter(r => r._1 % 4 == 3)
        .map(r => f"| ${r._1 + 1} | ${r._2} | ${r._3 / 1048576.0}%.1f | ${r._4}%.2f |")
        .mkString("\n")
    // table rows substitute AFTER stripMargin (inside it, the margin
    // strip would eat each row's leading table pipe)
    val tpl =
      s"""## State-store growth — againstHistoryStateful, $perBatch keys/trigger (75% novel)
         |
         |default (HDFS-backed heap) provider:
         |
         || trigger | state rows | state heap (MiB) | wall (s) |
         ||---|---|---|---|
         |@HEAP@
         |
         |RocksDB provider + changelog checkpointing:
         |
         || trigger | state rows | state mem (MiB) | wall (s) |
         ||---|---|---|---|
         |@ROCKS@
         |""".stripMargin
    println(tpl.replace("@HEAP@", fmt(heap)).replace("@ROCKS@", fmt(rocks)))
    spark.stop()
  }
}
