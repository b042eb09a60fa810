package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-trigger cost vs accumulated corpus size for the StreamStore
  * dedup streams — the measurement behind the scaladocs' "at corpus
  * scale hold the store bucketed / compact on cadence" guidance: the
  * seen-probe joins the batch against the WHOLE key store, so the
  * per-trigger wall carries a term linear in store size plus a term
  * linear in store FILE COUNT (one file batch per trigger without
  * compaction). This tool drives SubstrDedupStream with all-novel
  * synthetic docs (worst case: the store grows every trigger, nothing
  * dedups) and records trigger wall against store rows, with and
  * without cadenced compaction — the file-count term is the one
  * compaction removes; the row term is the one an external state
  * backend (RocksDB twins) or key-bucketed layout caps.
  *
  * Usage: `runMain graft.tools.StoreGrowth [triggers] [docsPerBatch]` */
object StoreGrowth {
  def main(args: Array[String]): Unit = {
    val nTriggers = if (args.length > 0) args(0).toInt else 24
    val perBatch = if (args.length > 1) args(1).toInt else 200
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-store-growth")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def run(compactEvery: Int): Seq[(Int, Long, Long, Double)] = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_growth_$compactEvery").toString
      val s = new graft.streaming.SubstrDedupStream(spark, dir + "/keys",
        "doc_id", "text", n = 8, compactEvery = compactEvery,
        gateFromBytes = 0L) // engage the gate from byte one: this tool
        // measures the gated-vs-ungated probe slope, not the threshold
      val rnd = new scala.util.Random(1)
      var id = 0L
      val out = (0 until nTriggers).map { b =>
        val docs = (0 until perBatch).map { _ =>
          id += 1
          (id, (0 until 40).map(_ => "w" + rnd.nextInt(500000))
            .mkString(" "))
        }
        val t0 = System.nanoTime()
        s.processBatch(docs.toDF("doc_id", "text"), b.toLong)
        graft.core.Metrics.drainUnpersist()
        val wall = (System.nanoTime() - t0) / 1e9
        val p = new org.apache.hadoop.fs.Path(dir + "/keys")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // recursive: bucketed stores keep files under __bucket=N/ dirs
        val it = fs.listFiles(p, true)
        var files = 0
        while (it.hasNext) {
          if (it.next().getPath.getName.endsWith(".parquet")) files += 1
        }
        // through the store API: the raw root read misses the hidden
        // _delta leg of the two-tier layout
        val rows = new graft.streaming.StreamStore(spark, dir + "/keys")
          .visible(Long.MaxValue).map(_.count()).getOrElse(0L)
        (b, rows, files.toLong, wall)
      }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
      out
    }

    // warm the code paths once so run 1's JIT doesn't read as growth
    run(0)
    val plain = run(0)
    val compacted = run(8)
    def fmt(rows: Seq[(Int, Long, Long, Double)]): String =
      rows.filter(r => r._1 % 4 == 3)
        .map(r => f"| ${r._1 + 1} | ${r._2} | ${r._3} | ${r._4}%.2f |")
        .mkString("\n")
    // table rows substitute AFTER stripMargin (inside it, the margin
    // strip would eat each row's leading table pipe)
    val tpl =
      s"""## StreamStore growth — SubstrDedupStream, all-novel batches ($perBatch docs × 40 tokens)
         |
         |compactEvery=0 (no maintenance):
         |
         || trigger | store rows | store files | wall (s) |
         ||---|---|---|---|
         |@PLAIN@
         |
         |compactEvery=8:
         |
         || trigger | store rows | store files | wall (s) |
         ||---|---|---|---|
         |@COMPACT@
         |""".stripMargin
    println(tpl.replace("@PLAIN@", fmt(plain))
      .replace("@COMPACT@", fmt(compacted)))
    spark.stop()
  }
}
