package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clusters around (10,0) and (0,10)
  private def vecs = ((0 until 20).map(i =>
    (i.toLong, Array(10f + (i % 5) * 0.1f, (i % 3) * 0.1f))) ++
    (20 until 40).map(i =>
      (i.toLong, Array((i % 3) * 0.1f, 10f + (i % 5) * 0.1f))))
    .toDF("vec_id", "embedding")

  test("train converges to the two cluster centers; deterministic") {
    val m1 = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 3)
    val m2 = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 3)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    val centers = m1.centroids.map(c => (c(0).round, c(1).round)).toSet
    assert(centers == Set((10L, 0L), (0L, 10L)))
  }

  test("assign puts each vector in its cluster") {
    val m = Ivf.train(vecs, "vec_id", "embedding", k = 2)
    val assigned = Ivf.assign(vecs, "embedding", m)
      .select("vec_id", "__cluster").as[(Long, Int)].collect().toMap
    val clusterOfFirst = assigned(0L)
    assert((0L until 20L).forall(assigned(_) == clusterOfFirst))
    assert((20L until 40L).forall(assigned(_) != clusterOfFirst))
  }

  test("topK with nprobe=1 matches brute force for an in-cluster query") {
    val m = Ivf.train(vecs, "vec_id", "embedding", k = 2)
    val q = Array(10.0, 0.0)
    val ivf = Ivf.topK(vecs, "vec_id", "embedding", m, q, k = 5, nprobe = 1)
      .select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf == brute)
  }

  test("indexed probe equals unindexed topK and partition-prunes the scan") {
    val m = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx").toString + "/idx"
    Ivf.index(vecs, "embedding", m, path)
    // model sidecar round-trips exactly
    val loaded = Ivf.loadModel(spark, path)
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      m.centroids.map(_.toSeq).toSeq)
    val q = Array(10.0, 0.0)
    val probed = Ivf.probe(spark, path, "vec_id", "embedding", q,
      k = 5, nprobe = 1)
    val direct = Ivf.topK(vecs, "vec_id", "embedding", m, q,
      k = 5, nprobe = 1)
    assert(probed.select("vec_id").as[Long].collect().toSeq ==
      direct.select("vec_id").as[Long].collect().toSeq)
    // the probe must be PARTITION PRUNING, not a filter over a full scan:
    // the scan's PartitionFilters carries the cell predicate
    val plan = probed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined, plan)
    // only the probed cell directory is read: one of the two cells
    val scanned = "PartitionCount: (\\d+)".r.findFirstMatchIn(plan)
    scanned.foreach(sc => assert(sc.group(1).toInt == 1, plan))
    // cell-clustered write: exactly one data file per cell directory
    val root = new java.io.File(path)
    val cellDirs = root.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length == 2, cellDirs.mkString(","))
    cellDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
  }

  test("probeFiltered: predicate applies inside the pruned scan; widening restores recall") {
    // vectors with a metadata column: even ids are label A, odd label B
    val labeled = ((0 until 20).map(i =>
      (i.toLong, Array(10f + (i % 5) * 0.1f, (i % 3) * 0.1f),
        if (i % 2 == 0) "A" else "B")) ++
      (20 until 40).map(i =>
        (i.toLong, Array((i % 3) * 0.1f, 10f + (i % 5) * 0.1f),
          if (i % 2 == 0) "A" else "B")))
      .toDF("vec_id", "embedding", "label")
    val m = Ivf.train(labeled, "vec_id", "embedding", k = 2, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_fidx").toString + "/idx"
    Ivf.index(labeled, "embedding", m, path)
    val q = Array(10.0, 0.0)
    val got = Ivf.probeFiltered(spark, path, "vec_id", "embedding", q,
      k = 5, pred = col("label") === "A", nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    // equals brute force restricted to the probed cell AND the label
    val cellOf = Ivf.assign(labeled, "embedding", m)
      .select("vec_id", "__cluster").as[(Long, Int)].collect().toMap
    val probedCell = m.nearest(q, 1).head
    val expect = Similarity.bruteForceTopK(
        labeled.filter(col("label") === "A")
          .filter(col("vec_id").isin(
            cellOf.filter(_._2 == probedCell).keys.toSeq: _*)),
        "vec_id", "embedding", q, k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(got == expect)
    // every result satisfies the predicate (even ids only)
    assert(got.forall(_ % 2 == 0), got.toString)
    // the predicate rides the pruned scan — no join in the plan
    val plan = Ivf.probeFiltered(spark, path, "vec_id", "embedding", q,
      k = 5, pred = col("label") === "A", nprobe = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined, plan)
    // widening: nprobe=2 sees at least as many label-A candidates as
    // nprobe=1 (the selectivity rule's mechanism)
    val n1 = Ivf.probeFiltered(spark, path, "vec_id", "embedding", q,
      k = 100, pred = col("label") === "A", nprobe = 1).count()
    val n2 = Ivf.probeFiltered(spark, path, "vec_id", "embedding", q,
      k = 100, pred = col("label") === "A", nprobe = 2).count()
    assert(n2 > n1, s"widening did not grow candidates: $n1 vs $n2")
  }

  test("probeManyFiltered == per-query probeFiltered; unfiltered path unchanged") {
    val labeled = ((0 until 20).map(i =>
      (i.toLong, Array(10f + (i % 5) * 0.1f, (i % 3) * 0.1f),
        if (i % 2 == 0) "A" else "B")) ++
      (20 until 40).map(i =>
        (i.toLong, Array((i % 3) * 0.1f, 10f + (i % 5) * 0.1f),
          if (i % 2 == 0) "A" else "B")))
      .toDF("vec_id", "embedding", "label")
    val m = Ivf.train(labeled, "vec_id", "embedding", k = 2, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_fmany").toString + "/idx"
    Ivf.index(labeled, "embedding", m, path)
    val qs = Seq(100L -> Array(10.0, 0.0), 101L -> Array(0.0, 10.0))
    val batch = Ivf.probeManyFiltered(spark, path, "vec_id", "embedding",
        qs, k = 4, pred = col("label") === "A", nprobe = 1)
      .select("query_id", "vec_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    qs.foreach { case (qid, q) =>
      val single = Ivf.probeFiltered(spark, path, "vec_id", "embedding",
          q, k = 4, pred = col("label") === "A", nprobe = 1)
        .select("vec_id").as[Long].collect().toSet
      assert(batch(qid) == single, s"query $qid batch != single")
      assert(batch(qid).forall(_ % 2 == 0))
    }
  }

  test("probeMany == per-query probe, one scan for the whole batch") {
    val m = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_many").toString + "/idx"
    Ivf.index(vecs, "embedding", m, path)
    val queries = Seq(1L -> Array(10.0, 0.0), 2L -> Array(0.0, 10.0),
      3L -> Array(7.0, 7.0))
    val batched = Ivf.probeMany(spark, path, "vec_id", "embedding",
      queries, k = 4, nprobe = 1)
    for ((qid, q) <- queries) {
      val single = Ivf.probe(spark, path, "vec_id", "embedding", q,
        k = 4, nprobe = 1)
        .as[(Long, Double)].collect().toSeq
      val slice = batched.filter(col("query_id") === qid)
        .select("vec_id", "cosine_sim").as[(Long, Double)].collect().toSeq
      assert(slice == single, s"query $qid")
    }
    // one scan: the plan reads the index exactly once
    val scans = "Scan parquet".r
      .findAllMatchIn(batched.queryExecution.executedPlan.toString).length
    assert(scans == 1, s"expected one index scan, got $scans")
  }

  test("streaming ANN ingest: foreachBatch indexAppend, probe sees batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_stream").toString + "/idx"
    Ivf.index(vecs.filter(col("vec_id") < 20), "embedding", m, path)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .outputMode("append")
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft_ivf_ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Ivf.indexAppend(spark, path, batch, "embedding")
      }.start()
    try {
      mem.addData((100L, Array(0.2f, 10.3f)), (101L, Array(10.1f, 0.3f)))
      q.processAllAvailable()
      mem.addData((102L, Array(0.1f, 10.4f)))
      q.processAllAvailable()
    } finally q.stop()
    val top = Ivf.probe(spark, path, "vec_id", "embedding",
      Array(0.0, 10.0), k = 3, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    // streamed vectors are live in the probed cell
    assert(top.intersect(Set(100L, 102L)).nonEmpty, top.toString)
  }

  test("compactIndex: appends pile up files, compaction restores 1/cell") {
    import org.apache.spark.sql.functions.col
    val m = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_comp").toString + "/idx"
    Ivf.index(vecs.filter(col("vec_id") < 20), "embedding", m, path)
    Ivf.indexAppend(spark, path,
      vecs.filter(col("vec_id") >= 20 && col("vec_id") < 30), "embedding")
    Ivf.indexAppend(spark, path,
      vecs.filter(col("vec_id") >= 30), "embedding")
    def files(cell: String) = new java.io.File(path, cell).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val q = Array(0.0, 10.0)
    val before = Ivf.probe(spark, path, "vec_id", "embedding", q,
      k = 5, nprobe = 1).collect().toSeq
    val grew = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cell="))
      .exists(d => d.listFiles().count(_.getName.endsWith(".parquet")) > 1)
    assert(grew, "appends should have accumulated files")
    Ivf.compactIndex(spark, path)
    new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cell="))
      .foreach(d => assert(files(d.getName) == 1, d.getName))
    // probes identical before/after; model sidecar survived
    val after = Ivf.probe(spark, path, "vec_id", "embedding", q,
      k = 5, nprobe = 1).collect().toSeq
    assert(after == before)
    assert(Ivf.loadModel(spark, path).centroids.map(_.toSeq).toSeq ==
      m.centroids.map(_.toSeq).toSeq)
  }

  test("index recovery: a crash-stranded __old copy is restored on read") {
    val m = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_rec").toString + "/idx"
    Ivf.index(vecs, "embedding", m, path)
    val q = Array(10.0, 0.0)
    val before = Ivf.probe(spark, path, "vec_id", "embedding", q,
      k = 5, nprobe = 1).collect().toSeq
    // simulate a compaction crash between the two renames
    assert(new java.io.File(path).renameTo(new java.io.File(path + "__old")))
    val after = Ivf.probe(spark, path, "vec_id", "embedding", q,
      k = 5, nprobe = 1).collect().toSeq
    assert(after == before)
    assert(new java.io.File(path).exists &&
      !new java.io.File(path + "__old").exists)
  }

  test("index recovery: marker + completed shadow rolls the swap FORWARD") {
    val m = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_fwd").toString + "/idx"
    Ivf.index(vecs, "embedding", m, path)
    val q = Array(10.0, 0.0)
    val before = Ivf.probe(spark, path, "vec_id", "embedding", q,
      k = 5, nprobe = 1).collect().toSeq
    // simulate a compactIndex crash AFTER renaming the index aside but
    // BEFORE renaming the shadow in: marker present, shadow complete.
    // (here the "shadow" is a byte-identical copy, which is what a
    // completed compaction write is)
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(path), fs,
      new org.apache.hadoop.fs.Path(path + "__compacting"), false,
      spark.sparkContext.hadoopConfiguration)
    assert(new java.io.File(path).renameTo(new java.io.File(path + "__old")))
    fs.create(new org.apache.hadoop.fs.Path(path + "__swapping"), true).close()
    val after = Ivf.probe(spark, path, "vec_id", "embedding", q,
      k = 5, nprobe = 1).collect().toSeq
    assert(after == before)
    // recovery completed the swap and cleaned every transient
    assert(new java.io.File(path).exists)
    assert(!new java.io.File(path + "__old").exists)
    assert(!new java.io.File(path + "__swapping").exists)
    assert(!new java.io.File(path + "__compacting").exists)
  }

  test("index recovery: marker with target PRESENT — fresh marker left " +
    "alone (live maintainer), stale marker reclaimed (post-swap crash)") {
    val m = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_stale").toString + "/idx"
    Ivf.index(vecs, "embedding", m, path)
    val q = Array(10.0, 0.0)
    val before = Ivf.probe(spark, path, "vec_id", "embedding", q,
      k = 5, nprobe = 1).collect().toSeq
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // a maintainer has just created the marker but not yet renamed the
    // target aside (slow-but-alive): __old from a previous swap may also
    // still exist — recovery must touch NEITHER
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(path), fs,
      new org.apache.hadoop.fs.Path(path + "__old"), false,
      spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(path + "__swapping")
    fs.create(marker, true).close()
    val during = Ivf.probe(spark, path, "vec_id", "embedding", q,
      k = 5, nprobe = 1).collect().toSeq
    assert(during == before)
    assert(new java.io.File(path + "__swapping").exists,
      "fresh marker must survive recovery — deleting it unguards a live " +
        "maintainer's two-rename window")
    assert(new java.io.File(path + "__old").exists,
      "__old must survive while the marker is fresh")
    // age the marker past the reclaim bound: now it is a provable crash
    // leftover (swap completed, cleanup never ran) and recovery sweeps it
    val past = System.currentTimeMillis() - Ivf.StaleSwapMarkerMs - 60000L
    fs.setTimes(marker, past, -1L)
    val after = Ivf.probe(spark, path, "vec_id", "embedding", q,
      k = 5, nprobe = 1).collect().toSeq
    assert(after == before)
    assert(!new java.io.File(path + "__swapping").exists,
      "stale marker must be reclaimed")
    assert(!new java.io.File(path + "__old").exists)
  }

  test("trainSampled: deterministic subset, assignments still total") {
    val m1 = Ivf.trainSampled(vecs, "vec_id", "embedding", k = 2,
      iters = 2, buckets = 2, keep = 1)
    val m2 = Ivf.trainSampled(vecs, "vec_id", "embedding", k = 2,
      iters = 2, buckets = 2, keep = 1)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    // every corpus row (sampled for training or not) gets a cell
    assert(Ivf.assign(vecs, "embedding", m1).count() == 40)
  }

  test("indexAppend routes a new batch into the stored cell geometry") {
    import org.apache.spark.sql.functions.col
    val m = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val first = vecs.filter(col("vec_id") < 30)
    val rest = vecs.filter(col("vec_id") >= 30)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_app").toString + "/idx"
    Ivf.index(first, "embedding", m, path)
    Ivf.indexAppend(spark, path, rest, "embedding")
    // appended index answers exactly like an index built all at once
    val full = java.nio.file.Files
      .createTempDirectory("graft_ivf_full").toString + "/idx"
    Ivf.index(vecs, "embedding", m, full)
    val q = Array(0.0, 10.0) // the >=30 cluster's region
    val viaAppend = Ivf.probe(spark, path, "vec_id", "embedding", q,
      k = 5, nprobe = 1).collect().toSeq
    val viaFull = Ivf.probe(spark, full, "vec_id", "embedding", q,
      k = 5, nprobe = 1).collect().toSeq
    assert(viaAppend == viaFull)
    assert(viaAppend.map(_.getLong(0)).forall(_ >= 20L)) // right cluster
  }

  test("cellDrift: balanced batch near zero, one-sided batch concentrates drift") {
    import org.apache.spark.sql.functions.col
    val m = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_drift").toString + "/idx"
    Ivf.index(vecs, "embedding", m, path)
    // a batch mirroring the corpus: both cells, same 50/50 shape
    val balanced = Ivf.cellDrift(spark, path,
      vecs.filter(col("vec_id") % 2 === 0), "embedding")
      .select("cell", "drift").as[(Long, Double)].collect().toMap
    assert(balanced.size == 2 && balanced.values.forall(_ < 0.01),
      s"balanced batch must not drift: $balanced")
    // a batch entirely from ONE cluster: that cell's share doubles,
    // the other's collapses to zero — drift mass appears on both
    val skewed = Ivf.cellDrift(spark, path,
      vecs.filter(col("vec_id") < 20), "embedding")
      .select("cell", "n_batch", "drift").as[(Long, Long, Double)]
      .collect()
    assert(skewed.exists(r => r._2 == 0 && r._3 > 0.3),
      s"emptied cell must carry drift: ${skewed.toSeq}")
    assert(skewed.map(_._3).sum > 0.3, s"total drift: ${skewed.toSeq}")
    // degenerate inputs fail loudly, not with a deep ANSI div-by-zero
    intercept[IllegalArgumentException] {
      Ivf.cellDrift(spark, path, vecs.filter(col("vec_id") < 0),
        "embedding").collect()
    }
  }
}
