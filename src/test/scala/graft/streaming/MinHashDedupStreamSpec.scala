package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming MinHash near-dup dedup: batch-order replay equivalence
  * with the incremental operator + keep rule, exactly-once replay, and
  * compaction invariance. */
class MinHashDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  // near-dup family f: long shared token body, tiny suffix tweak —
  // 3-gram jaccard well above the 0.3 estimate cut
  private def txt(family: Int, variant: Int): String = {
    val body = (0 until 24).map(i => s"tok${family}w$i").mkString(" ")
    if (variant == 0) body else s"$body extra$variant"
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("streamed survivors == batch-order replay of incremental + keep") {
    val dir = Files.createTempDirectory("mhstream").toString + "/sigs"
    val s = new MinHashDedupStream(spark, dir, "doc_id", "text",
      estThreshold = 0.3)
    val batches = Seq(
      Seq((1L, txt(0, 0)), (2L, txt(0, 1)), (3L, txt(1, 0))),
      Seq((4L, txt(1, 1)), (5L, txt(2, 0)), (6L, txt(2, 1))),
      Seq((7L, txt(0, 2)), (8L, txt(3, 0))))
    val streamed = batches.zipWithIndex.map { case (b, i) =>
      ids(s.processBatch(b.toDF("doc_id", "text"), i.toLong))
    }
    // reference replay with the BATCH primitives over an explicit
    // signature accumulator (earlier-batch-wins + min-id keep)
    var corpus = Seq.empty[(Long, String)]
    val expected = batches.map { b =>
      val stored = Dedup.minHashSignaturesPortable(
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      val pairs = Dedup.minHashIncrementalPortable(
        b.toDF("doc_id", "text"), "doc_id", "text", stored,
        estThreshold = 0.3)
        .as[(Long, Long, Double)].collect()
      val bIds = b.map(_._1).toSet
      val drops = pairs.map { case (a, bb, _) =>
        if (!bIds.contains(a)) bb else if (!bIds.contains(bb)) a else bb
      }.toSet
      val surv = b.filterNot(r => drops.contains(r._1))
      corpus ++= surv
      surv.map(_._1).toSet
    }
    assert(streamed == expected)
    // the known decisions: 2 dups 1 in-batch; 4 dups 3 cross-batch;
    // 6 dups 5 in-batch; 7 dups family 0 cross-batch; 8 is novel
    assert(streamed == Seq(Set(1L, 3L), Set(5L), Set(8L)))
  }

  test("fresh-checkpoint restart (new lineage) keeps the signature corpus") {
    val dir = Files.createTempDirectory("mhstream3").toString + "/sigs"
    val a = new MinHashDedupStream(spark, dir, "doc_id", "text",
      estThreshold = 0.3, lineage = "run-a")
    ids(a.processBatch(Seq((1L, txt(0, 0))).toDF("doc_id", "text"), 0L))
    // new lineage, batch id restarts at 0: doc 2 near-dups lineage-a's
    // doc 1 and must drop (same-lineage-only filtering would admit it)
    val b = new MinHashDedupStream(spark, dir, "doc_id", "text",
      estThreshold = 0.3, lineage = "run-b")
    assert(ids(b.processBatch(
      Seq((2L, txt(0, 1)), (3L, txt(9, 0))).toDF("doc_id", "text"), 0L))
      == Set(3L))
  }

  test("pointer-pruned colliding triggers match the gate-off baseline; the table lives and compacts bucketed (r18)") {
    val batches = Seq(
      (0 until 12).map(i => (i.toLong, txt(i, 0))),
      // duplicate-heavy: 6 near-dups of stored families + 2 novel
      (0 until 6).map(i => (100L + i, txt(i, 1))) ++
        Seq((200L, txt(50, 0)), (201L, txt(51, 0))),
      // all-novel: the skip path
      (0 until 4).map(i => (300L + i, txt(60 + i, 0))))
    def drive(p: String): Seq[Set[Long]] = {
      val s = new MinHashDedupStream(spark, p, "doc_id", "text",
        estThreshold = 0.3, gateFromBytes = 0L, compactEvery = 2)
      val out = batches.zipWithIndex.map { case (b, i) =>
        val r = ids(s.processBatch(b.toDF("doc_id", "text"), i.toLong))
        graft.core.Metrics.drainUnpersist()
        r
      }
      out
    }
    val dirG = Files.createTempDirectory("mhptr").toString + "/sigs"
    val dir0 = Files.createTempDirectory("mhptr0").toString + "/sigs"
    val gated = drive(dirG)
    sys.props("graft.stream.gate") = "off"
    val baseline =
      try drive(dir0)
      finally sys.props.remove("graft.stream.gate")
    assert(gated == baseline, "pointer-pruned decisions diverged")
    assert(gated(1) == Set(200L, 201L), s"dups must drop: ${gated(1)}")
    // the pointer table exists beside the sig store, bucketed after the
    // cadenced compact, and holds exactly the survivors' band keys
    val ptr = new StreamStore(spark, dirG + "__bands")
    assert(ptr.exists, "gated run must maintain the pointer table")
    val names = new java.io.File(dirG + "__bands").listFiles()
      .map(_.getName)
    assert(names.exists(_.startsWith("__bucket=")), names.mkString(","))
    val sigStore = new StreamStore(spark, dirG)
    val sigIds = sigStore.visible(Long.MaxValue).get
      .select("id").as[Long].collect().toSet
    val ptrIds = ptr.visible(Long.MaxValue).get
      .select("id").as[Long].collect().toSet
    assert(ptrIds == sigIds,
      "pointer table must cover every stored doc (completeness)")
    // gate-off baseline never pays for the table
    assert(!new java.io.File(dir0 + "__bands").exists(),
      "the A/B baseline leg must not create or maintain the table")
  }

  test("adopting an r17 signature-only store backfills the pointer table once, tags preserved (r18)") {
    val dir = Files.createTempDirectory("mhadopt").toString + "/sigs"
    // phase 1: corpus accumulated with the gate off — no pointer table
    sys.props("graft.stream.gate") = "off"
    try {
      val legacy = new MinHashDedupStream(spark, dir, "doc_id", "text",
        estThreshold = 0.3, gateFromBytes = 0L)
      ids(legacy.processBatch(
        (0 until 8).map(i => (i.toLong, txt(i, 0)))
          .toDF("doc_id", "text"), 0L))
      graft.core.Metrics.drainUnpersist()
    } finally sys.props.remove("graft.stream.gate")
    assert(!new java.io.File(dir + "__bands").exists())
    // phase 2: gated instance adopts the store (fresh lineage, ids back
    // at 0) — first trigger backfills the table and screens through it
    val s = new MinHashDedupStream(spark, dir, "doc_id", "text",
      estThreshold = 0.3, gateFromBytes = 0L, lineage = "adopt")
    val out = ids(s.processBatch(
      Seq((100L, txt(0, 1)), (101L, txt(40, 0)))
        .toDF("doc_id", "text"), 0L))
    graft.core.Metrics.drainUnpersist()
    assert(out == Set(101L),
      "backfilled pointer table must route the dup to the probe")
    // backfill preserved the ORIGINAL batch tags: every pointer row
    // carries phase 1's batch_id/lineage, so replay visibility holds
    val ptr = new StreamStore(spark, dir + "__bands")
    val tags = ptr.visible(Long.MaxValue).get
      .filter(col("id") < 100L)
      .select("batch_id", "lineage").distinct()
      .as[(Long, String)].collect().toSet
    assert(tags == Set((0L, "default")), s"tags: $tags")
  }

  test("replaying a batch id reproduces identical survivors; compact folds dups") {
    val dir = Files.createTempDirectory("mhstream2").toString + "/sigs"
    val s = new MinHashDedupStream(spark, dir, "doc_id", "text",
      estThreshold = 0.3)
    ids(s.processBatch(Seq((1L, txt(0, 0))).toDF("doc_id", "text"), 0L))
    val b = Seq((2L, txt(0, 1)), (3L, txt(4, 0))).toDF("doc_id", "text")
    val first = ids(s.processBatch(b, 1L))
    val replay = ids(s.processBatch(b, 1L))
    // 3's sig was appended by the first attempt; the replay must not
    // see it (batch_id filter) — identical output, not a self-dup drop
    assert(first == Set(3L) && replay == Set(3L))
    s.compact()
    val sigs = spark.read.parquet(dir)
    assert(sigs.count() == sigs.select("id").distinct().count())
    // post-compaction decisions unchanged: family 4 still dups 3
    assert(ids(s.processBatch(
      Seq((9L, txt(4, 1)), (10L, txt(5, 0))).toDF("doc_id", "text"), 2L))
      == Set(10L))
  }
}
