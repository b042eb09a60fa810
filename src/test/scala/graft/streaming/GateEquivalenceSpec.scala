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
