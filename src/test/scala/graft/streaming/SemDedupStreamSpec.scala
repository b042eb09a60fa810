package graft.streaming

import graft.SparkSpec
import graft.ops.{Ivf, SemDedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end streaming SemDeDup: MemoryStream micro-batches through the
  * foreachBatch body, duplicates resolved against the growing index,
  * compaction cadence exercised live. */
class SemDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** id → vector: base vectors are axis-aligned one-hots scaled per
    * family; `dupOf`-style near-copies add a tiny orthogonal nudge so
    * cosine ≈ 1 against the family base and ≈ 0 across families. */
  private def vec(family: Int, nudge: Double): Array[Float] = {
    val v = Array.fill(dim)(0.0f)
    v(family % dim) = 1.0f
    v((family + 1) % dim) = nudge.toFloat
    v
  }

  private def df(rows: Seq[(Long, Array[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def seedIndex(path: String, rows: Seq[(Long, Array[Float])])
      : Unit = {
    val seed = df(rows)
    val model = Ivf.train(seed, "vec_id", "embedding", k = 4, iters = 2)
    Ivf.index(seed, "embedding", model, path)
  }

  test("batches dedup against corpus AND within batch; survivors advance the corpus") {
    val tmp = java.nio.file.Files
      .createTempDirectory("semstream").toString + "/idx"
    // corpus: families 0 and 1
    seedIndex(tmp, Seq(1L -> vec(0, 0.0), 2L -> vec(1, 0.0)))
    val s = new SemDedupStream(spark, tmp, "vec_id", "embedding",
      threshold = 0.95, compactEvery = 0)

    // batch 1: near-dup of family 0 (drop), new family 2 (keep), plus a
    // within-batch dup pair of family 3 (min id 40 kept, 41 dropped)
    val n1 = s.processBatch(df(Seq(
      10L -> vec(0, 0.01), 20L -> vec(2, 0.0),
      40L -> vec(3, 0.01), 41L -> vec(3, 0.02))))
    assert(n1 == 2, "batch 1: expected survivors 20 and 40")

    // batch 2: dup of batch-1 survivor family 2 → dropped (the corpus
    // advanced), dup of family 3 → dropped, new family 4 → kept
    val n2 = s.processBatch(df(Seq(
      50L -> vec(2, 0.01), 51L -> vec(3, 0.03), 60L -> vec(4, 0.0))))
    assert(n2 == 1, "batch 2: only family 4 is new")

    val (batches, appended, dropped) = s.stats
    assert(batches == 2 && appended == 3 && dropped == 4)

    // the index now holds exactly the 2 seeds + 3 survivors
    val ids = spark.read.parquet(tmp).select("vec_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 20L, 40L, 60L))
  }

  test("streamed result == batch-order replay of incremental + keep") {
    val tmp = java.nio.file.Files
      .createTempDirectory("semstream2").toString + "/idx"
    val seedRows = Seq(1L -> vec(0, 0.0), 2L -> vec(5, 0.0))
    seedIndex(tmp, seedRows)
    val batches = Seq(
      Seq(10L -> vec(0, 0.015), 11L -> vec(2, 0.0), 12L -> vec(2, 0.01)),
      Seq(20L -> vec(2, 0.02), 21L -> vec(6, 0.0), 22L -> vec(5, 0.01)),
      Seq(30L -> vec(6, 0.01), 31L -> vec(7, 0.0)))
    val s = new SemDedupStream(spark, tmp, "vec_id", "embedding",
      threshold = 0.95, compactEvery = 0)
    val streamed = batches.map(b => s.processBatch(df(b)))

    // reference: same decision replayed with the BATCH primitives over an
    // explicit corpus accumulator (greedy earlier-batch-wins semantics)
    val tmpRef = java.nio.file.Files
      .createTempDirectory("semstream2ref").toString + "/idx"
    seedIndex(tmpRef, seedRows)
    val model = Ivf.loadModel(spark, tmpRef)
    val expected = batches.map { b =>
      val corpusDups = SemDedup.incrementalAgainstIndex(spark, tmpRef,
        df(b), "vec_id", "embedding", 0.95)
        .select(col("id").as("__d")).distinct()
      val after = df(b).join(corpusDups, col("vec_id") === col("__d"),
        "left_anti")
      val surv = SemDedup.keep(after, "vec_id", "embedding", model, 0.95)
      Ivf.indexAppend(spark, tmpRef, surv, "embedding")
      surv.count()
    }
    assert(streamed == expected)
    val a = spark.read.parquet(tmp).select("vec_id").as[Long]
      .collect().sorted.toSeq
    val e = spark.read.parquet(tmpRef).select("vec_id").as[Long]
      .collect().sorted.toSeq
    assert(a == e)
  }

  test("distributed drop-algebra fallback == driver-side set algebra") {
    // driverPairCap = 0 forces every batch down the distributed r15
    // algebra; the default cap takes the driver-side InSet path — the
    // two must decide identically (same survivors, same final index)
    def run(cap: Int): (Seq[Long], Seq[Long]) = {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"semstream_cap$cap").toString + "/idx"
      seedIndex(tmp, Seq(1L -> vec(0, 0.0), 2L -> vec(5, 0.0)))
      val s = new SemDedupStream(spark, tmp, "vec_id", "embedding",
        threshold = 0.95, compactEvery = 0, driverPairCap = cap)
      val counts = Seq(
        Seq(10L -> vec(0, 0.015), 11L -> vec(2, 0.0),
          12L -> vec(2, 0.01), 13L -> vec(2, 0.02)),
        Seq(20L -> vec(2, 0.02), 21L -> vec(6, 0.0), 22L -> vec(5, 0.01)))
        .map(b => s.processBatch(df(b)))
      (counts, spark.read.parquet(tmp).select("vec_id").as[Long]
        .collect().sorted.toSeq)
    }
    val (cDriver, idxDriver) = run(SemDedupStream.DefaultDriverPairCap)
    val (cDist, idxDist) = run(0)
    assert(cDriver == cDist)
    assert(idxDriver == idxDist)
    assert(cDriver == Seq(1L, 1L)) // 11 kept, then 21; 10/12/13/20/22 dup
  }

  test("replayed batches are no-ops: marker fast path + id append guard") {
    val tmp = java.nio.file.Files
      .createTempDirectory("semstream4").toString + "/idx"
    seedIndex(tmp, Seq(1L -> vec(0, 0.0), 2L -> vec(1, 0.0)))
    val s = new SemDedupStream(spark, tmp, "vec_id", "embedding",
      threshold = 0.95, compactEvery = 0)
    val b = Seq(10L -> vec(2, 0.0), 11L -> vec(2, 0.01))
    assert(s.processBatch(df(b), batchId = 0L) == 1) // 10 kept, 11 in-batch dup

    // at-least-once replay, marker intact → fast path, nothing read/written
    assert(s.processBatch(df(b), batchId = 0L) == 0L)
    assert(s.skipped == 1)

    // crash window: append succeeded but the marker write was lost —
    // the replay passes the fast path, and the id guard must still not
    // re-append survivor 10 (its corpus copy is excluded from the probe
    // by the =!= self-guard, so without the append guard it WOULD dup)
    val marker = new org.apache.hadoop.fs.Path(tmp, "_last_applied_batch")
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(marker, false)
    assert(s.processBatch(df(b), batchId = 0L) == 0L)

    val ids = spark.read.parquet(tmp).select("vec_id").as[Long]
      .collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 10L), s"index must hold no duplicates: $ids")
    // phase breakdown accumulates across batches
    val ph = s.phaseTotals
    assert(Seq("ingest", "probe", "keep", "append", "compact")
      .forall(ph.contains))
    assert(ph("probe") > 0 && ph("append") > 0)
  }

  test("fresh-checkpoint restart (new lineage): marker does not skip, guard holds") {
    val tmp = java.nio.file.Files
      .createTempDirectory("semstream5").toString + "/idx"
    seedIndex(tmp, Seq(1L -> vec(0, 0.0), 2L -> vec(1, 0.0)))
    val a = new SemDedupStream(spark, tmp, "vec_id", "embedding",
      threshold = 0.95, compactEvery = 0, lineage = "run-a")
    assert(a.processBatch(df(Seq(10L -> vec(2, 0.0))), batchId = 3L) == 1)
    // new query lineage restarts at batchId 0 ≤ run-a's marker (3) —
    // a lineage-blind marker would silently skip this batch
    val b = new SemDedupStream(spark, tmp, "vec_id", "embedding",
      threshold = 0.95, compactEvery = 0, lineage = "run-b")
    assert(b.processBatch(df(Seq(
      20L -> vec(2, 0.01), // dups run-a's survivor 10 → dropped
      21L -> vec(3, 0.0))), batchId = 0L) == 1)
    assert(b.skipped == 0)
    val ids = spark.read.parquet(tmp).select("vec_id").as[Long]
      .collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 10L, 21L))
  }

  test("live stream with compaction cadence: one file per cell after, probes unchanged") {
    val tmp = java.nio.file.Files
      .createTempDirectory("semstream3").toString + "/idx"
    seedIndex(tmp, Seq(1L -> vec(0, 0.0), 2L -> vec(1, 0.0)))
    val s = new SemDedupStream(spark, tmp, "vec_id", "embedding",
      threshold = 0.95, compactEvery = 2)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: DataFrame, id: Long) => s.processBatch(b, id); () }
      .start()
    try {
      mem.addData((100L, vec(2, 0.0)), (101L, vec(2, 0.02)))
      q.processAllAvailable()
      mem.addData((110L, vec(3, 0.0))) // triggers compaction (batch 2)
      q.processAllAvailable()
      mem.addData((120L, vec(3, 0.01)), (121L, vec(4, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val (batches, appended, dropped) = s.stats
    assert(batches == 3 && appended == 3 && dropped == 2)
    // survivors: 100 (family 2), 110 (family 3), 121 (family 4)
    val ids = spark.read.parquet(tmp).select("vec_id").as[Long]
      .collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 100L, 110L, 121L))
    // probe equivalence after compaction: pruned probe == brute force
    // over the index contents for a family-2 query
    val got = Ivf.probe(spark, tmp, "vec_id", "embedding",
      vec(2, 0.0).map(_.toDouble), k = 1)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(100L))
  }
}
