package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * [mode]` — mode ∈ substr (default) | winnow | minhash | para (r18 —
  * one paragraph per synthetic doc; same key-semi-join probe shape as
  * substr at 1/33rd the keys), covering the probe shapes: key
  * semi-join, fp inner-join, band-key join.
  *
  * r18 modes for the two VERDICT r17 "done" criteria:
  *
  *  - '''substrsat''' — substr with a sketch sized an order of
  *    magnitude UNDER the key count the run accumulates
  *    (items 2^10 / bits 2^13), so the growth crosses sketch capacity
  *    repeatedly: gate-ON wall must stay flat THROUGH the logged
  *    saturation rebuilds (the r17 static sketch would drift toward
  *    fpp 1 and the full-scan slope instead);
  *  - '''minhashdup''' — duplicate-HEAVY triggers against a corpus
  *    seeded DIRECTLY into the store between measurements (driving it
  *    through triggers would take hours): each measured batch repeats
  *    seeded texts, so every trigger collides and the corpus term the
  *    pointer table prunes is on the hot path — r17's skip-only gate
  *    re-scanned the whole signature store here. Seeds are compacted
  *    into the bucketed base before each measurement (the base is
  *    where pruning bites; the delta always reads whole). args:
  *    [rounds] [seedPerRound].
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

    if (mode == "minhashdup") { runMinhashDup(spark, nTriggers, perBatch); spark.stop(); return }
    if (mode == "minhashburst") {
      runMinhashBurst(spark, nTriggers, perBatch); spark.stop(); return
    }
    if (mode == "winnowdup" || mode == "paradup") {
      runDup(spark, mode, nTriggers, perBatch); spark.stop(); return
    }

    // (storePath, processBatch, gate-rebuild counter) per mode
    def mkStream(dir: String, compactEvery: Int)
        : (String, (DataFrame, Long) => Unit, () => Long) = mode match {
      case "winnow" =>
        val s = new graft.streaming.WinnowQuoteStream(spark,
          dir + "/fps", "doc_id", "text", k = 3, w = 4,
          minShared = 2L, compactEvery = compactEvery,
          gateFromBytes = 0L)
        (dir + "/fps", (df, b) => { s.processBatch(df, b); () },
          () => -1L)
      case "minhash" =>
        val s = new graft.streaming.MinHashDedupStream(spark,
          dir + "/sigs", "doc_id", "text",
          compactEvery = compactEvery, gateFromBytes = 0L)
        (dir + "/sigs", (df, b) => { s.processBatch(df, b); () },
          () => s.gateRebuilds)
      case "para" =>
        val s = new graft.streaming.ParaDedupStream(spark,
          dir + "/keys", "doc_id", "text",
          compactEvery = compactEvery, gateFromBytes = 0L)
        (dir + "/keys", (df, b) => { s.processBatch(df, b); () },
          () => -1L)
      case "substrsat" =>
        val s = new graft.streaming.SubstrDedupStream(spark,
          dir + "/keys", "doc_id", "text", n = 8,
          compactEvery = compactEvery, gateFromBytes = 0L,
          sketchItems = 1L << 10, sketchBits = 1L << 13)
        (dir + "/keys", (df, b) => { s.processBatch(df, b); () },
          () => s.gateRebuilds)
      case _ =>
        val s = new graft.streaming.SubstrDedupStream(spark,
          dir + "/keys", "doc_id", "text", n = 8,
          compactEvery = compactEvery, gateFromBytes = 0L)
        (dir + "/keys", (df, b) => { s.processBatch(df, b); () },
          () => s.gateRebuilds)
    }

    def run(compactEvery: Int): Seq[(Int, Long, Long, Double, Long)] = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_growth_$compactEvery").toString
      val (storePath, process, rebuilds) = mkStream(dir, compactEvery)
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
        (b, rows, files.toLong, wall, rebuilds())
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
    def fmt(rows: Seq[(Int, Long, Long, Double, Long)]): String =
      rows.filter(r => r._1 % 4 == 3)
        .map(r => f"| ${r._1 + 1} | ${r._2} | ${r._3} | ${r._4}%.2f | ${r._5} |")
        .mkString("\n")
    // table rows substitute AFTER stripMargin (inside it, the margin
    // strip would eat each row's leading table pipe)
    val tpl =
      s"""## StreamStore growth — $mode stream ($perBatch docs × 40 tokens)
         |
         |compactEvery=0 (no maintenance):
         |
         || trigger | store rows | store files | wall (s) | rebuilds |
         ||---|---|---|---|---|
         |@PLAIN@
         |
         |compactEvery=8:
         |
         || trigger | store rows | store files | wall (s) | rebuilds |
         ||---|---|---|---|---|
         |@COMPACT@
         |""".stripMargin
    println(tpl.replace("@PLAIN@", fmt(plain))
      .replace("@COMPACT@", fmt(compacted)))
    spark.stop()
  }

  /** winnowdup / paradup (VERDICT r18 #4): duplicate-heavy growth legs
    * for the two probe shapes the r18 dup harness left uncovered — the
    * winnow fp inner-join and the para key semi-join. Unlike minhash
    * signatures, per-doc processing here is cheap enough to grow the
    * corpus THROUGH the stream: per round a seed trigger of
    * `seedPerRound` novel docs runs unmeasured, then ONE 25%-repeat
    * trigger is measured (wall + decision deltas). winnowdup
    * constructs with `maxFpDocs = 4` and `compactEvery = 4`, so the
    * cadence compact CAPS hot fingerprints and SHRINKS the store — the
    * shrink(-regrow) regime the GateKeeper small-path sketch drop
    * exists for — and with an undersized sketch
    * (items 2^10 / bits 2^13) so saturation rebuilds fire: cap + gate
    * + saturation exercised together. Run with
    * `SPARK_GRAFT_STREAM_GATE=off` for the A/B leg: decisions per
    * measured trigger (pairs for winnow, kept/dropped for para) must
    * be byte-identical — the fixture is seeded, so equality is exact. */
  private def runDup(spark: SparkSession, mode: String, rounds: Int,
      perBatch: Int): Unit = {
    import spark.implicits._
    val seedPerRound =
      sys.env.getOrElse("SPARK_GRAFT_SEED_PER_ROUND", "4000").toInt
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_growth_$mode").toString
    val rnd = new scala.util.Random(7)
    var id = 0L
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    // multi-paragraph docs so the para probe has per-paragraph keys;
    // winnow fingerprints span the same token stream either way
    def novel(): String =
      (0 until 4).map(_ => (0 until 10)
        .map(_ => "w" + rnd.nextInt(500000)).mkString(" "))
        .mkString(" <p> ")
    val (process, decisions, rebuilds):
        ((DataFrame, Long) => Unit, () => (Long, Long), () => Long) =
      mode match {
        case "winnowdup" =>
          val s = new graft.streaming.WinnowQuoteStream(spark,
            dir + "/fps", "doc_id", "text", k = 3, w = 4,
            minShared = 2L, compactEvery = 4, gateFromBytes = 0L,
            sketchItems = 1L << 10, sketchBits = 1L << 13,
            maxFpDocs = 4L)
          ((df, b) => { s.processBatch(df, b).count(); () },
            () => { val (_, p, f) = s.stats; (p, f) },
            () => s.gateRebuilds)
        case _ =>
          val s = new graft.streaming.ParaDedupStream(spark,
            dir + "/keys", "doc_id", "text", " <p> ",
            compactEvery = 4, gateFromBytes = 0L,
            sketchItems = 1L << 10, sketchBits = 1L << 13)
          ((df, b) => { s.processBatch(df, b).count(); () },
            () => { val (_, k, d) = s.stats; (k, d) },
            () => s.gateRebuilds)
      }
    val rows = (0 until rounds).map { r =>
      // unmeasured seed trigger: grows the corpus with novel docs
      val seedDocs = (0 until seedPerRound).map { _ =>
        id += 1; val t = novel(); seen += t; (id, t)
      }
      process(seedDocs.toDF("doc_id", "text"), (2L * r))
      graft.core.Metrics.drainUnpersist()
      val (a0, b0) = decisions()
      // measured trigger: 25% verbatim repeats of seen docs
      val batch = (0 until perBatch).map { k =>
        id += 1
        if (k % 4 == 0) (id, seen(rnd.nextInt(seen.length)))
        else (id, novel())
      }
      val t0 = System.nanoTime()
      process(batch.toDF("doc_id", "text"), (2L * r + 1))
      graft.core.Metrics.drainUnpersist()
      val wall = (System.nanoTime() - t0) / 1e9
      val (a1, b1) = decisions()
      (r, (r + 1).toLong * seedPerRound, wall, rebuilds(),
        a1 - a0, b1 - b0)
    }
    val gate =
      if (sys.env.get("SPARK_GRAFT_STREAM_GATE")
          .exists(_.equalsIgnoreCase("off"))) "OFF" else "ON"
    val cols =
      if (mode == "winnowdup") "pairs | fps stored" else "kept | dropped"
    println(s"## StreamStore growth — $mode, gate $gate " +
      s"($perBatch-doc triggers, 25% repeats, $seedPerRound seeds/round)")
    println("")
    println(s"| round | corpus docs | trigger wall (s) | rebuilds | $cols |")
    println("|---|---|---|---|---|---|")
    rows.foreach { r =>
      println(f"| ${r._1} | ${r._2} | ${r._3}%.2f | ${r._4} | ${r._5} | ${r._6} |")
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir))
  }

  /** minhashburst (VERDICT r18 #5): the leg that shows the pointer
    * table's WALL-TIME win, which minhashdup could not. minhashdup's
    * 25%-scattered repeats touch every bucket (2000 batch docs × 16
    * bands ≫ bucket count), so pruning saved nothing and the gated
    * path's fixed cost never crossed under the OFF leg's full scan by
    * 400k docs. The winning regime is a FOCUSED duplicate burst — the
    * hot-document shape (a viral page re-ingested): repeats drawn from
    * `SPARK_GRAFT_HOT_DOCS` (default 20) hot seeds, so candidates
    * collapse to ~hot ids, the signature store reads ~hot/buckets of
    * its bytes, and the OFF leg's corpus term (full scan + 16×
    * band-explode of EVERY stored signature) has nothing to amortize
    * it against. Corpus is built from DETERMINISTIC id→text generation
    * (`textOf`), so repeat texts regenerate from seed ids with no
    * driver-side corpus buffer — points can reach millions of docs.
    * Per point: `SPARK_GRAFT_SEED_PER_ROUND` (default 500k) novel
    * docs' signatures append out-of-band (lineage "seed"), a fresh
    * stream adopts + compacts (single-writer contract, as minhashdup),
    * one warm trigger pays adoption outside the window, then TWO
    * measured bursts. ON/OFF kept/dropped must match exactly.
    * args: [points] [perBatch]. */
  private def runMinhashBurst(spark: SparkSession, points: Int,
      perBatch: Int): Unit = {
    import spark.implicits._
    val seedPerPoint =
      sys.env.getOrElse("SPARK_GRAFT_SEED_PER_ROUND", "500000").toInt
    val hotN = sys.env.getOrElse("SPARK_GRAFT_HOT_DOCS", "20").toInt
    val buckets =
      sys.env.getOrElse("SPARK_GRAFT_STORE_BUCKETS", "1024").toInt
    val dupsPerBatch = perBatch / 4
    val dir = java.nio.file.Files
      .createTempDirectory("graft_growth_mhburst").toString
    val sigPath = dir + "/sigs"
    // deterministic 40-token doc for any id (negative ids = never
    // seeded, i.e. novel) — same id, same text, so a repeat of seed id
    // k is regenerated, not remembered
    def textOf(idc: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 40).map(j =>
        concat(lit("w"), pmod(xxhash64(idc, lit(j)), lit(500000)))): _*)
    var novelBase = 10_000_000_000L // batch doc ids, above any seed id
    val rows = (0 until points).flatMap { r =>
      val lo = r.toLong * seedPerPoint
      val seed = spark.range(lo, lo + seedPerPoint)
        .select(col("id").as("doc_id"), textOf(col("id")).as("text"))
      val sigs = graft.ops.Dedup.minHashSignaturesPortable(
        seed, "doc_id", "text").localCheckpoint()
      new graft.streaming.StreamStore(spark, sigPath, "seed", buckets,
        "id").append(sigs.select(col("id"), col("sig")), r.toLong)
      val ptr = new graft.streaming.StreamStore(spark,
        sigPath + "__bands", "seed", buckets, "bkh")
      if (ptr.exists)
        ptr.append(sigs.select(col("id"),
            explode(graft.ops.Dedup.portableBandKeys(col("sig"), 16, 4))
              .as("__bk"))
          .select(xxhash64(col("__bk")).as("bkh"), col("id")), r.toLong)
      sigs.unpersist()
      // sketch sizing is the lever that decides whether pruning bites:
      // at the GateKeeper's default steady state (rebuild band 0.2)
      // ~20% of the batch's NOVEL band keys survive the bloom as false
      // positives, which alone touches every bucket — the 100 TB
      // deployment sizing rule is ~8-10 bits per corpus band key
      // (fpp ≤ 1%), and the env overrides let the leg measure both
      // regimes
      val skItems = sys.env.getOrElse("SPARK_GRAFT_SKETCH_ITEMS",
        (1L << 21).toString).toLong
      val skBits = sys.env.getOrElse("SPARK_GRAFT_SKETCH_BITS",
        (1L << 24).toString).toLong
      val s = new graft.streaming.MinHashDedupStream(spark, sigPath,
        "doc_id", "text", gateFromBytes = 0L, storeBuckets = buckets,
        sketchItems = skItems, sketchBits = skBits)
      s.compact()
      novelBase += perBatch
      s.processBatch(spark.range(1).select(lit(novelBase).as("doc_id"),
        textOf(lit(-novelBase)).as("text")), (1000 + 10 * r).toLong)
      graft.core.Metrics.drainUnpersist()
      (0 until 2).map { t =>
        val (_, k0, d0) = s.stats
        novelBase += perBatch + 1
        val base = novelBase
        // first dupsPerBatch rows repeat a hot seed id's text; the
        // rest are novel (negative generator ids, never seeded)
        val batch = spark.range(perBatch).select(
          (lit(base) + col("id")).as("doc_id"),
          when(col("id") < dupsPerBatch,
            textOf(pmod(xxhash64(col("id"), lit(r * 2 + t)), lit(hotN))))
            .otherwise(textOf(-(lit(base) + col("id")))).as("text"))
        val t0 = System.nanoTime()
        s.processBatch(batch, (1000 + 10 * r + 1 + t).toLong)
        graft.core.Metrics.drainUnpersist()
        val wall = (System.nanoTime() - t0) / 1e9
        val (_, k1, d1) = s.stats
        (r, (r + 1).toLong * seedPerPoint, t, wall, s.gateRebuilds,
          k1 - k0, d1 - d0)
      }
    }
    val gate =
      if (sys.env.get("SPARK_GRAFT_STREAM_GATE")
          .exists(_.equalsIgnoreCase("off"))) "OFF" else "ON"
    println(s"## StreamStore growth — minhashburst, gate $gate " +
      s"($perBatch-doc triggers, $dupsPerBatch repeats of $hotN hot " +
      s"docs, $seedPerPoint seeds/point, $buckets buckets)")
    println("")
    println("| point | corpus docs | trigger | wall (s) | rebuilds | batch kept | batch dropped |")
    println("|---|---|---|---|---|---|---|")
    rows.foreach { r =>
      println(f"| ${r._1} | ${r._2} | ${r._3} | ${r._4}%.2f | ${r._5} | ${r._6} | ${r._7} |")
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir))
  }

  /** The minhashdup leg (mode doc above): per round, `seedPerRound`
    * novel docs' signatures append DIRECTLY to the store (lineage
    * "seed" — counts as corpus for the stream), a FRESH stream instance
    * adopts the store (out-of-band seeding breaks a live instance's
    * bloom-superset invariant — the store contract is single-writer, so
    * the harness must re-adopt like a restart; the first tool draft
    * kept one instance and measurably MISSED seeded duplicates), the
    * stream compacts both stores into the bucketed base, a 1-doc warm
    * trigger pays the adoption sketch rebuild outside the measured
    * window, then ONE duplicate-heavy 25%-repeat batch runs through the
    * stream and only ITS wall is measured. */
  private def runMinhashDup(spark: SparkSession, rounds: Int,
      perBatch: Int): Unit = {
    import spark.implicits._
    val seedPerRound =
      sys.env.getOrElse("SPARK_GRAFT_SEED_PER_ROUND", "8000").toInt
    val dir = java.nio.file.Files
      .createTempDirectory("graft_growth_mhdup").toString
    val sigPath = dir + "/sigs"
    val rnd = new scala.util.Random(7)
    var id = 0L
    val seedTexts = scala.collection.mutable.ArrayBuffer.empty[String]
    def novel(): String =
      (0 until 40).map(_ => "w" + rnd.nextInt(500000)).mkString(" ")
    val rows = (0 until rounds).map { r =>
      // seed chunk, lineage "seed", batch id = round
      val chunk = (0 until seedPerRound).map { _ =>
        id += 1; val t = novel(); seedTexts += t; (id, t)
      }
      val sigs = graft.ops.Dedup.minHashSignaturesPortable(
        chunk.toDF("doc_id", "text"), "doc_id", "text")
        .localCheckpoint()
      // minHashSignaturesPortable already names the id column "id"
      new graft.streaming.StreamStore(spark, sigPath, "seed", 256, "id")
        .append(sigs.select(col("id"), col("sig")), r.toLong)
      val ptr = new graft.streaming.StreamStore(spark,
        sigPath + "__bands", "seed", 256, "bkh")
      // before the stream's first gated trigger the pointer table does
      // not exist — its backfill covers every earlier seed wholesale
      if (ptr.exists)
        ptr.append(sigs.select(col("id"),
            explode(graft.ops.Dedup.portableBandKeys(col("sig"), 16, 4))
              .as("__bk"))
          .select(xxhash64(col("__bk")).as("bkh"), col("id")), r.toLong)
      sigs.unpersist()
      // fresh instance = restart adoption over the seeded store
      val s = new graft.streaming.MinHashDedupStream(spark, sigPath,
        "doc_id", "text", gateFromBytes = 0L, storeBuckets = 256)
      s.compact() // seeds land in the bucketed base both stores
      // warm trigger: pays backfill/sketch-rebuild outside the window
      id += 1
      s.processBatch(Seq((id, novel())).toDF("doc_id", "text"),
        (1000 + 2 * r).toLong)
      graft.core.Metrics.drainUnpersist()
      val (_, k0, d0) = s.stats
      // measured trigger: 25% verbatim repeats of seeded texts
      val batch = (0 until perBatch).map { k =>
        id += 1
        if (k % 4 == 0) (id, seedTexts(rnd.nextInt(seedTexts.length)))
        else (id, novel())
      }
      val t0 = System.nanoTime()
      s.processBatch(batch.toDF("doc_id", "text"),
        (1000 + 2 * r + 1).toLong)
      graft.core.Metrics.drainUnpersist()
      val wall = (System.nanoTime() - t0) / 1e9
      val (_, k1, d1) = s.stats
      (r, (r + 1).toLong * seedPerRound, wall, s.gateRebuilds, k1 - k0,
        d1 - d0)
    }
    val gate =
      if (sys.env.get("SPARK_GRAFT_STREAM_GATE")
          .exists(_.equalsIgnoreCase("off"))) "OFF" else "ON"
    println(s"## StreamStore growth — minhashdup, gate $gate " +
      s"($perBatch-doc triggers, 25% seeded repeats, " +
      s"$seedPerRound seeds/round)")
    println("")
    println("| round | corpus docs | trigger wall (s) | rebuilds | batch kept | batch dropped |")
    println("|---|---|---|---|---|---|")
    rows.foreach { r =>
      println(f"| ${r._1} | ${r._2} | ${r._3}%.2f | ${r._4} | ${r._5} | ${r._6} |")
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir))
  }
}
