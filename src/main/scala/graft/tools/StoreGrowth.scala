package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-trigger cost vs accumulated corpus size for the StreamStore
  * dedup streams — the measurement behind the scaladocs' "at corpus
  * scale hold the store bucketed / compact on cadence" guidance, and
  * (r17) the A/B harness for the bloom+bucket probe gate: the
  * pre-gate seen-probe joined the batch against the WHOLE key store,
  * so the per-trigger wall carried a term linear in store size plus a
  * term linear in store FILE COUNT. The tool drives a dedup stream
  * with all-novel synthetic docs (worst case: the store grows every
  * trigger, nothing dedups) and records trigger wall against store
  * rows, with and without cadenced compaction. Streams construct with
  * `gateFromBytes = 0` — the tool measures the gated-vs-ungated probe
  * slope (`SPARK_GRAFT_STREAM_GATE=off` for the baseline leg), not
  * the small-store threshold.
  *
  * Usage: `runMain graft.tools.StoreGrowth [triggers] [docsPerBatch]
  * [mode]` — mode ∈ substr (default) | winnow | minhash, covering the
  * three probe shapes: key semi-join, fp inner-join, band-key join.
  */
object StoreGrowth {
  def main(args: Array[String]): Unit = {
    val nTriggers = if (args.length > 0) args(0).toInt else 24
    val perBatch = if (args.length > 1) args(1).toInt else 200
    val mode = if (args.length > 2) args(2) else "substr"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-store-growth")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // (storePath, processBatch) per mode — same all-novel doc feed
    def mkStream(dir: String, compactEvery: Int)
        : (String, (DataFrame, Long) => Unit) = mode match {
      case "winnow" =>
        val s = new graft.streaming.WinnowQuoteStream(spark,
          dir + "/fps", "doc_id", "text", k = 3, w = 4,
          minShared = 2L, compactEvery = compactEvery,
          gateFromBytes = 0L)
        (dir + "/fps", (df, b) => { s.processBatch(df, b); () })
      case "minhash" =>
        val s = new graft.streaming.MinHashDedupStream(spark,
          dir + "/sigs", "doc_id", "text",
          compactEvery = compactEvery, gateFromBytes = 0L)
        (dir + "/sigs", (df, b) => { s.processBatch(df, b); () })
      case _ =>
        val s = new graft.streaming.SubstrDedupStream(spark,
          dir + "/keys", "doc_id", "text", n = 8,
          compactEvery = compactEvery, gateFromBytes = 0L)
        (dir + "/keys", (df, b) => { s.processBatch(df, b); () })
    }

    def run(compactEvery: Int): Seq[(Int, Long, Long, Double)] = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_growth_$compactEvery").toString
      val (storePath, process) = mkStream(dir, compactEvery)
      val rnd = new scala.util.Random(1)
      var id = 0L
      val out = (0 until nTriggers).map { b =>
        val docs = (0 until perBatch).map { _ =>
          id += 1
          (id, (0 until 40).map(_ => "w" + rnd.nextInt(500000))
            .mkString(" "))
        }
        val t0 = System.nanoTime()
        process(docs.toDF("doc_id", "text"), b.toLong)
        graft.core.Metrics.drainUnpersist()
        val wall = (System.nanoTime() - t0) / 1e9
        val p = new org.apache.hadoop.fs.Path(storePath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // recursive: bucketed stores keep files under __bucket=N/ dirs
        val it = fs.listFiles(p, true)
        var files = 0
        while (it.hasNext) {
          if (it.next().getPath.getName.endsWith(".parquet")) files += 1
        }
        // through the store API: the raw root read misses the hidden
        // _delta leg of the two-tier layout
        val rows = new graft.streaming.StreamStore(spark, storePath)
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
      s"""## StreamStore growth — $mode stream, all-novel batches ($perBatch docs × 40 tokens)
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
