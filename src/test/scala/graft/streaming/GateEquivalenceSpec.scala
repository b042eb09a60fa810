package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Decisions must be BYTE-IDENTICAL across every probe regime the r17
  * bloom+bucket gate can land in — gated, forced-fallback (cap 0),
  * saturated sketch (tiny bits → fpp near 1), and flat-store legacy —
  * because the gate is an access-path optimization, never a semantic:
  * bloom false positives route to the exact probe and untouched
  * buckets hold no surviving key. */
class GateEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("gateeq").toString

  // dup-heavy + novelty-mixed batches: the corpus catches repeats of
  // batch 1 in batch 2, within-batch dups in batch 3
  private val batches = Seq(
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")),
    Seq((3L, "intro the quick brown fox jumps over the lazy dog outro"),
      (4L, "all fresh words nothing shared with anyone here")),
    Seq((5L, "pack my box with five dozen liquor jugs again"),
      (6L, "pack my box with five dozen liquor jugs twice")))

  private def runSubstr(mk: String => SubstrDedupStream)
      : Seq[Seq[(Long, String, Long, Long)]] = {
    val dir = tmp()
    val s = mk(dir + "/keys")
    batches.zipWithIndex.map { case (rows, i) =>
      val out = s.processBatch(rows.toDF("id", "text"), i.toLong)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
        .sortBy(_._1).toSeq
      graft.core.Metrics.drainUnpersist()
      out
    }
  }

  test("substr: gated == fallback == saturated == flat == small-store") {
    def base(p: String) = new SubstrDedupStream(spark, p, "id", "text",
      4, gateFromBytes = 0L)
    val gated = runSubstr(base)
    // cap 0: every trigger overflows to the shuffle fallback
    val fb = runSubstr(p => new SubstrDedupStream(spark, p, "id",
      "text", 4, broadcastCap = 0L, gateFromBytes = 0L))
    // 64-bit sketch: fpp ~1 — every key "survives", probe stays exact
    val sat = runSubstr(p => new SubstrDedupStream(spark, p, "id",
      "text", 4, sketchItems = 4L, sketchBits = 64L,
      gateFromBytes = 0L))
    // storeBuckets 0: legacy flat layout, no pruning possible
    val flat = runSubstr(p => new SubstrDedupStream(spark, p, "id",
      "text", 4, storeBuckets = 0, gateFromBytes = 0L))
    // default threshold: tiny store stays on the ungated r16 path
    val small = runSubstr(p => new SubstrDedupStream(spark, p, "id",
      "text", 4))
    assert(fb == gated, "fallback diverged")
    assert(sat == gated, "saturated sketch diverged")
    assert(flat == gated, "flat store diverged")
    assert(small == gated, "small-store path diverged")
  }

  private def runWinnow(mk: String => WinnowQuoteStream)
      : Seq[Set[(Long, Long, Long)]] = {
    val dir = tmp()
    val s = mk(dir + "/fps")
    batches.zipWithIndex.map { case (rows, i) =>
      val out = s.processBatch(rows.toDF("id", "text"), i.toLong)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      graft.core.Metrics.drainUnpersist()
      out
    }
  }

  test("winnow: gated == fallback == saturated == flat == small-store") {
    def base(p: String) = new WinnowQuoteStream(spark, p, "id", "text",
      3, 4, minShared = 1L, gateFromBytes = 0L)
    val gated = runWinnow(base)
    val fb = runWinnow(p => new WinnowQuoteStream(spark, p, "id",
      "text", 3, 4, minShared = 1L, broadcastCap = 0L,
      gateFromBytes = 0L))
    val sat = runWinnow(p => new WinnowQuoteStream(spark, p, "id",
      "text", 3, 4, minShared = 1L, sketchItems = 4L, sketchBits = 64L,
      gateFromBytes = 0L))
    val flat = runWinnow(p => new WinnowQuoteStream(spark, p, "id",
      "text", 3, 4, minShared = 1L, storeBuckets = 0,
      gateFromBytes = 0L))
    val small = runWinnow(p => new WinnowQuoteStream(spark, p, "id",
      "text", 3, 4, minShared = 1L))
    assert(fb == gated, "fallback diverged")
    assert(sat == gated, "saturated sketch diverged")
    assert(flat == gated, "flat store diverged")
    assert(small == gated, "small-store path diverged")
    assert(gated.exists(_.nonEmpty), "fixture must produce pairs")
  }

  private val paraBatches = Seq(
    Seq((1L, "alpha\n\nbeta"), (2L, "gamma\n\ndelta")),
    Seq((3L, "alpha\n\nfresh one"), (4L, "delta\n\nanother new")),
    Seq((5L, "beta\n\nbeta"), (6L, "gamma\n\nfinal")))

  private def runPara(mk: String => ParaDedupStream)
      : Seq[Seq[(Long, String, Long, Long)]] = {
    val dir = tmp()
    val s = mk(dir + "/keys")
    paraBatches.zipWithIndex.map { case (rows, i) =>
      val out = s.processBatch(rows.toDF("id", "text"), i.toLong)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
        .sortBy(_._1).toSeq
      graft.core.Metrics.drainUnpersist()
      out
    }
  }

  test("para: gated == fallback == saturated == flat == small-store") {
    def base(p: String) = new ParaDedupStream(spark, p, "id", "text",
      gateFromBytes = 0L)
    val gated = runPara(base)
    val fb = runPara(p => new ParaDedupStream(spark, p, "id", "text",
      broadcastCap = 0L, gateFromBytes = 0L))
    val sat = runPara(p => new ParaDedupStream(spark, p, "id", "text",
      sketchItems = 4L, sketchBits = 64L, gateFromBytes = 0L))
    val flat = runPara(p => new ParaDedupStream(spark, p, "id", "text",
      storeBuckets = 0, gateFromBytes = 0L))
    val small = runPara(p => new ParaDedupStream(spark, p, "id", "text"))
    assert(fb == gated, "fallback diverged")
    assert(sat == gated, "saturated sketch diverged")
    assert(flat == gated, "flat store diverged")
    assert(small == gated, "small-store path diverged")
  }

  private def runMinhash(mk: String => MinHashDedupStream)
      : Seq[Set[Long]] = {
    val dir = tmp()
    val s = mk(dir + "/sigs")
    batches.zipWithIndex.map { case (rows, i) =>
      val out = s.processBatch(rows.toDF("id", "text"), i.toLong)
        .select("id").collect().map(_.getLong(0)).toSet
      graft.core.Metrics.drainUnpersist()
      out
    }
  }

  test("minhash: gated == small-store == saturated-sketch survivors") {
    def base(p: String) = new MinHashDedupStream(spark, p, "id", "text",
      estThreshold = 0.3, gateFromBytes = 0L)
    val gated = runMinhash(base)
    val small = runMinhash(p => new MinHashDedupStream(spark, p, "id",
      "text", estThreshold = 0.3))
    val sat = runMinhash(p => new MinHashDedupStream(spark, p, "id",
      "text", estThreshold = 0.3, sketchItems = 4L, sketchBits = 64L,
      gateFromBytes = 0L))
    assert(small == gated, "small-store path diverged")
    assert(sat == gated, "saturated sketch diverged")
    assert(gated.flatten.nonEmpty)
  }

  test("substr shrink-then-regrow across gateFromBytes matches the gate-off baseline (ADVICE r18 bloom superset)") {
    // replays inflate the store (3× the same batch id), compact folds
    // it back under the threshold, a small-path batch appends NEW keys,
    // then the store regrows past the threshold and a repeat of those
    // keys arrives: a sketch held across the shrink would call them
    // absent and admit the duplicates. Threshold picked from a
    // measurement pass so the small/gated phases land deterministically.
    val docsA = (1 to 8).map(i =>
      (i.toLong, (1 to 30).map(j => s"wa${i}_$j").mkString(" ")))
    val docsB = (1 to 16).map(i =>
      (100L + i, (1 to 30).map(j => s"wb${i}_$j").mkString(" ")))
    val docsBRep = docsB.map { case (id, t) => (id + 500, t) }

    def drive(p: String, g: Long): (Seq[Seq[(Long, Long)]], Seq[Long]) = {
      // flat store: at fixture scale the bucketed layout's per-file
      // overhead outweighs the fold, so only a flat compact SHRINKS —
      // the sketch lifecycle under test is layout-independent
      val s = new SubstrDedupStream(spark, p, "id", "text", 4,
        storeBuckets = 0, gateFromBytes = g)
      def size() = new StreamStore(spark, p).dataBytes
      val sizes = scala.collection.mutable.Buffer.empty[Long]
      def run(rows: Seq[(Long, String)], b: Long) = {
        val out = s.processBatch(rows.toDF("id", "text"), b)
          .collect().map(r => (r.getLong(0), r.getLong(3)))
          .sortBy(_._1).toSeq
        graft.core.Metrics.drainUnpersist()
        sizes += size()
        out
      }
      val outs = Seq(run(docsA, 0L), run(docsA, 0L), run(docsA, 0L)) ++ {
        s.compact(); sizes += size()
        Seq(run(docsB, 1L), run(docsBRep, 2L))
      }
      (outs, sizes.toSeq)
    }

    // measurement pass (threshold never crossed): learn the size curve
    val (_, sz) = drive(tmp() + "/keys", Long.MaxValue)
    val (s1, s2, sc, s4) = (sz(0), sz(1), sz(3), sz(4))
    assert(s1 < s2 && sc < s2 && sc + 1 < s4,
      s"fixture sizes must shrink then regrow: $sz")
    val g = (math.max(s1, sc) + math.min(s2, s4)) / 2
    assert(g > math.max(s1, sc) && g <= math.min(s2, s4),
      s"no valid threshold window in $sz")

    val (gated, _) = drive(tmp() + "/keys", g)
    sys.props("graft.stream.gate") = "off"
    val (baseline, _) =
      try drive(tmp() + "/keys", g)
      finally sys.props.remove("graft.stream.gate")
    assert(gated == baseline,
      "gated shrink-regrow run diverged from the gate-off baseline")
    // the repeat batch must actually have been screened (n_dropped > 0)
    assert(baseline.last.forall(_._2 > 0L),
      s"fixture must cut the repeated docs: ${baseline.last}")
  }

  test("restart adoption rebuilds the sketch: a second instance over the same store still screens") {
    val dir = tmp()
    val a = new SubstrDedupStream(spark, dir + "/keys", "id", "text", 4,
      gateFromBytes = 0L)
    a.processBatch(batches.head.toDF("id", "text"), 0L)
    graft.core.Metrics.drainUnpersist()
    // fresh instance (restart): sketch must rebuild from the store, so
    // batch 2's repeat of batch 1 is caught through the gated path
    val b = new SubstrDedupStream(spark, dir + "/keys", "id", "text", 4,
      lineage = "second", gateFromBytes = 0L)
    val out = b.processBatch(batches(1).toDF("id", "text"), 0L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    graft.core.Metrics.drainUnpersist()
    assert(out(3L) > 0L, s"adopted corpus must cut the quoted span: $out")
    assert(out(4L) == 0L)
  }
}
