package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The overlapped trigger tail (VERDICT r18 #6): concurrent submission
  * of the independent tail actions (corpus append ∥ output sink) must
  * change WALL only — decisions, stats, and store contents stay
  * byte-identical to the sequential form, and failures on either side
  * propagate out of the trigger. The stream equivalence tests FORCE
  * the concurrent path (sysprop) — the shipping default is sequential
  * after the r19 A/B rejected local-mode concurrency, so without the
  * override they would compare sequential to sequential and pin
  * nothing. */
class OverlapSpec extends SparkSpec {
  import spark.implicits._

  private def forcedOn[T](body: => T): T = {
    sys.props("graft.trigger.overlap") = "on"
    try body finally sys.props.remove("graft.trigger.overlap")
  }

  test("auto: default is sequential, side-then-main order") {
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val r = Overlap.auto { order += "side" } { order += "main"; 7 }
    assert(r == 7 && order.toSeq == Seq("side", "main"))
    assert(!Overlap.enabled)
    forcedOn { assert(Overlap.enabled) }
  }

  test("concurrently: returns main's value after both sides complete") {
    @volatile var sideDone = false
    val r = Overlap.concurrently { Thread.sleep(30); sideDone = true } {
      21 * 2
    }
    assert(r == 42)
    assert(sideDone, "side action must complete before return")
  }

  test("concurrently: side failure propagates; main failure carries side's as suppressed") {
    val e1 = intercept[RuntimeException] {
      Overlap.concurrently(throw new RuntimeException("side"))(())
    }
    assert(e1.getMessage == "side")
    val e2 = intercept[IllegalStateException] {
      Overlap.concurrently { throw new RuntimeException("side2") } {
        throw new IllegalStateException("main")
      }
    }
    assert(e2.getMessage == "main")
    assert(e2.getSuppressed.exists(_.getMessage == "side2"),
      "both failures must be reported")
  }

  private def docs(b: Seq[(Long, String)]): DataFrame =
    b.toDF("doc_id", "text")

  // three batches with cross-batch and within-batch duplicate spans
  private val b1 = Seq((1L, "alpha beta gamma delta epsilon zeta eta"),
    (2L, "one two three four five six seven"))
  private val b2 = Seq(
    (3L, "noise alpha beta gamma delta epsilon zeta eta tail"),
    (4L, "brand new words with no overlap at all"))
  private val b3 = Seq(
    (5L, "one two three four five six seven again"),
    (6L, "brand new words with no overlap at all echo"))

  test("substr: overlapped sink == sequential (output, stats, store)") {
    val base = Files.createTempDirectory("overlap_substr").toString
    val seq0 = new SubstrDedupStream(spark, base + "/seqkeys",
      "doc_id", "text", n = 4)
    val ovl = new SubstrDedupStream(spark, base + "/ovlkeys",
      "doc_id", "text", n = 4)
    val seqOut = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val ovlOut = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      seqOut += rows(seq0.processBatch(docs(b), i.toLong))
      forcedOn(ovl.processBatch(docs(b), i.toLong,
        out => ovlOut += rows(out)))
      graft.core.Metrics.drainUnpersist()
    }
    assert(seqOut.toSeq == ovlOut.toSeq,
      s"outputs diverged:\nseq=$seqOut\novl=$ovlOut")
    assert(seq0.stats == ovl.stats)
    // un-compacted appends live in the hidden `_delta/` leg (the
    // StreamStore layout); no compact ran here, so that IS the store
    def storeRows(p: String): Seq[String] =
      spark.read.parquet(p + "/_delta").select("key", "batch_id")
        .collect().map(_.toString).sorted.toSeq
    assert(storeRows(base + "/seqkeys") == storeRows(base + "/ovlkeys"),
      "corpus stores diverged")
  }

  test("winnow: overlapped sink == sequential (pairs, stats)") {
    val base = Files.createTempDirectory("overlap_winnow").toString
    val mk = (p: String) => new WinnowQuoteStream(spark, base + p,
      "doc_id", "text", k = 3, w = 4, minShared = 2L)
    val s0 = mk("/seq"); val s1 = mk("/ovl")
    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      val a = rows(s0.processBatch(docs(b), i.toLong))
      var c: Seq[String] = null
      forcedOn(s1.processBatch(docs(b), i.toLong, out => c = rows(out)))
      graft.core.Metrics.drainUnpersist()
      assert(a == c, s"batch $i pairs diverged: seq=$a ovl=$c")
    }
    assert(s0.stats == s1.stats)
  }

  test("para: overlapped sink == sequential (output, stats)") {
    val base = Files.createTempDirectory("overlap_para").toString
    val pb = Seq(
      Seq((1L, "aa bb <p> cc dd"), (2L, "ee ff <p> aa bb")),
      Seq((3L, "cc dd <p> gg hh"), (4L, "ii jj <p> kk ll")))
    val s0 = new ParaDedupStream(spark, base + "/seq", "doc_id",
      "text", " <p> ")
    val s1 = new ParaDedupStream(spark, base + "/ovl", "doc_id",
      "text", " <p> ")
    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    pb.zipWithIndex.foreach { case (b, i) =>
      val a = rows(s0.processBatch(b.toDF("doc_id", "text"), i.toLong))
      var c: Seq[String] = null
      forcedOn(s1.processBatch(b.toDF("doc_id", "text"), i.toLong,
        out => c = rows(out)))
      graft.core.Metrics.drainUnpersist()
      assert(a == c, s"batch $i outputs diverged: seq=$a ovl=$c")
    }
    assert(s0.stats == s1.stats)
  }
}
