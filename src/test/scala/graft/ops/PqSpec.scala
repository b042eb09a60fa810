package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters in each half of the vector so subspace codebooks
  // have structure to find
  private def vecs = (0 until 40).map { i =>
    val base = if (i % 2 == 0) 1.0f else -1.0f
    (i.toLong, Array.tabulate(8)(d =>
      base * (1.0f + 0.01f * i) * (if (d < 4) 1f else 0.5f)))
  }.toDF("vec_id", "embedding")

  test("encode: codes in range, duplicates share codes, deterministic") {
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, k = 4)
    assert(cb.m == 2 && cb.k == 4)
    val enc = Pq.encode(vecs, "embedding", cb)
      .select("vec_id", "__code0", "__code1")
      .as[(Long, Int, Int)].collect()
    assert(enc.forall { case (_, c0, c1) =>
      c0 >= 0 && c0 < 4 && c1 >= 0 && c1 < 4 })
    // the two sign-clusters must land in different codes
    val byCluster = enc.groupBy(_._1 % 2).view.mapValues(_.map(_._2).toSet)
    assert(byCluster(0L).intersect(byCluster(1L)).isEmpty)
    val again = Pq.encode(vecs, "embedding", cb)
      .select("vec_id", "__code0", "__code1")
      .as[(Long, Int, Int)].collect()
    assert(enc.toSet == again.toSet)
  }

  test("adcTopK ranks the query's own cluster first") {
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, k = 4)
    val q = Array.tabulate(8)(d => if (d < 4) 1.0 else 0.5) // +1 cluster
    val top = Pq.adcTopK(vecs, "vec_id", "embedding", cb, q, topK = 10)
      .select("vec_id").as[Long].collect()
    assert(top.length == 10)
    assert(top.forall(_ % 2 == 0), s"negative-cluster id in $top")
    // estimated distances are monotone non-decreasing down the ranking
    val ds = Pq.adcTopK(vecs, "vec_id", "embedding", cb, q, topK = 10)
      .select("est_d2").as[Double].collect()
    assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
  }

  test("ivfPqTopK only ranks candidates from probed coarse cells") {
    val coarse = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, k = 4)
    val q = Array.tabulate(8)(d => if (d < 4) 1.0 else 0.5)
    // nprobe=1: every result must come from the query's own coarse cell
    val qCell = coarse.nearest(q, 1).head
    val cells = Ivf.assign(vecs, "embedding", coarse)
      .select("vec_id", "__cluster").as[(Long, Int)].collect().toMap
    val top = Pq.ivfPqTopK(vecs, "vec_id", "embedding", coarse, cb, q,
      topK = 10, nprobe = 1).select("vec_id").as[Long].collect()
    assert(top.nonEmpty && top.forall(cells(_) == qCell))
    // nprobe = k degenerates to plain ADC over everything
    val all = Pq.ivfPqTopK(vecs, "vec_id", "embedding", coarse, cb, q,
      topK = 10, nprobe = 2).select("vec_id").as[Long].collect()
    val adc = Pq.adcTopK(vecs, "vec_id", "embedding", cb, q, topK = 10)
      .select("vec_id").as[Long].collect()
    assert(all.toSeq == adc.toSeq)
  }

  test("fused training equals m independent per-subspace Ivf.train runs") {
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, k = 3)
    val independent = (0 until 2).map { j =>
      Ivf.train(
        vecs.select(col("vec_id"),
          slice(col("embedding"), j * 4 + 1, 4).as("__sub")),
        "vec_id", "__sub", k = 3, iters = 2)
    }
    for (j <- 0 until 2) {
      assert(cb.books(j).centroids.map(_.toSeq).toSeq ==
        independent(j).centroids.map(_.toSeq).toSeq, s"subspace $j")
    }
  }

  test("indexed probe equals ivfPqTopK; disk carries codes, not vectors") {
    val coarse = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, k = 4)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_idx").toString + "/idx"
    Pq.index(vecs, "vec_id", "embedding", coarse, cb, path)
    // codebook sidecar round-trips exactly
    val loaded = Pq.loadCodebooks(spark, path)
    assert(loaded.dsub == cb.dsub && loaded.m == cb.m)
    for (j <- 0 until cb.m)
      assert(loaded.books(j).centroids.map(_.toSeq).toSeq ==
        cb.books(j).centroids.map(_.toSeq).toSeq, s"book $j")
    val q = Array.tabulate(8)(d => if (d < 4) 1.0 else 0.5)
    val probed = Pq.probeIndexed(spark, path, "vec_id", q,
      topK = 10, nprobe = 1)
    val direct = Pq.ivfPqTopK(vecs, "vec_id", "embedding", coarse, cb, q,
      topK = 10, nprobe = 1)
    assert(probed.collect().toSeq == direct.collect().toSeq)
    // compression is real: the persisted schema has NO vector column
    val stored = spark.read.parquet(path)
    assert(!stored.columns.contains("embedding"), stored.columns.mkString(","))
    assert(stored.columns.toSet ==
      Set("vec_id", "cell", "__code0", "__code1"))
    // and the probe partition-prunes on the cell directory
    val plan = probed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined, plan)
  }

  test("adcRefineTopK: shortlist == corpus degenerates to exact ranking") {
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, k = 4)
    val q = Array.tabulate(8)(d => if (d < 4) 1.0 else 0.5)
    // shortlist covering everything -> stage 2 IS the exact ranking
    val refined = Pq.adcRefineTopK(vecs, "vec_id", "embedding", cb, q,
      topK = 5, shortlist = 40).select("vec_id").as[Long].collect().toSeq
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(refined == exact)
    // refined results always come from the ADC shortlist
    val sl = Pq.adcTopK(vecs, "vec_id", "embedding", cb, q, topK = 10)
      .select("vec_id").as[Long].collect().toSet
    val narrow = Pq.adcRefineTopK(vecs, "vec_id", "embedding", cb, q,
      topK = 5, shortlist = 10).select("vec_id").as[Long].collect().toSet
    assert(narrow.subsetOf(sl))
    intercept[IllegalArgumentException] {
      Pq.adcRefineTopK(vecs, "vec_id", "embedding", cb, q,
        topK = 5, shortlist = 3)
    }
  }

  test("ivfPqRefineTopK: wide shortlist = exact ranking within probed cells") {
    val coarse = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, k = 4)
    val q = Array.tabulate(8)(d => if (d < 4) 1.0 else 0.5)
    // shortlist covers every routed candidate -> stage 2 IS exact cosine
    // restricted to the probed cells
    val refined = Pq.ivfPqRefineTopK(vecs, "vec_id", "embedding", coarse,
      cb, q, topK = 5, nprobe = 1, shortlist = 40)
      .select("vec_id").as[Long].collect().toSeq
    val qCell = coarse.nearest(q, 1).head
    val inCell = Ivf.assign(vecs, "embedding", coarse)
      .filter(col("__cluster") === qCell).drop("__cluster")
    val exact = Similarity.bruteForceTopK(inCell, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(refined == exact)
    // residual variant under the same degenerate-shortlist condition
    val cbRes = Pq.trainResidual(vecs, "vec_id", "embedding", coarse,
      m = 2, dsub = 4, k = 4)
    val refinedRes = Pq.ivfPqResidualRefineTopK(vecs, "vec_id", "embedding",
      coarse, cbRes, q, topK = 5, nprobe = 1, shortlist = 40)
      .select("vec_id").as[Long].collect().toSeq
    assert(refinedRes == exact)
  }

  test("probeManyIndexed == per-query probeIndexed, one pruned scan") {
    val coarse = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, k = 4)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_many").toString + "/idx"
    Pq.index(vecs, "vec_id", "embedding", coarse, cb, path)
    val qs = Seq(
      (1L, Array.tabulate(8)(d => if (d < 4) 1.0 else 0.5)),
      (2L, Array.tabulate(8)(d => if (d < 4) -1.0 else -0.5)))
    val many = Pq.probeManyIndexed(spark, path, "vec_id", qs,
      topK = 5, nprobe = 1)
    for ((qid, q) <- qs) {
      val one = Pq.probeIndexed(spark, path, "vec_id", q,
        topK = 5, nprobe = 1).collect().toSeq
      val batch = many.filter(col("query_id") === qid)
        .select("vec_id", "est_d2").collect().toSeq
      assert(batch == one, s"query $qid")
    }
    // the batch serves off a single pruned scan
    val plan = many.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]".r.findAllIn(plan).size == 1, plan)
  }

  test("probeManyIndexed: join-LUT path == literal-LUT path at hundreds " +
    "of queries; join plan is O(1) in batch size") {
    val coarse = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, k = 4)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_lut").toString + "/idx"
    Pq.index(vecs, "vec_id", "embedding", coarse, cb, path)
    // 200 deterministic queries spread across both clusters — well above
    // LutLiteralMaxQueries, so the default path is the join form
    val qs = (0 until 200).map { i =>
      val s = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, Array.tabulate(8)(d =>
        s * (if (d < 4) 1.0 + (i % 7) * 0.01 else 0.5 - (i % 5) * 0.01)))
    }
    def run(lutLiteralMax: Int) =
      Pq.probeManyIndexed(spark, path, "vec_id", qs, topK = 5, nprobe = 1,
        lutLiteralMax = lutLiteralMax)
    val lit = run(Int.MaxValue) // forced literal path
    val join = run(0)           // forced join path
    assert(qs.size > Pq.LutLiteralMaxQueries)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("query_id", "vec_id", "est_d2")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(key(join) == key(lit))
    // the point of the join form: the literal plan carries every LUT
    // double in its expression tree (O(batch·m·k)); the join plan carries
    // none of them (LocalRelation data, constant-size plan)
    val litLen = lit.queryExecution.analyzed.toString.length
    val joinLen = join.queryExecution.analyzed.toString.length
    assert(joinLen * 5 < litLen,
      s"join plan ($joinLen chars) should be far smaller than the " +
        s"literal plan ($litLen chars) at ${qs.size} queries")
    // and it still serves off a single pruned scan
    val plan = join.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]".r.findAllIn(plan).size == 1, plan)
  }

  test("probeIndexedRefined == ivfPqRefineTopK over the served index") {
    val coarse = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, k = 4)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_ref").toString + "/idx"
    Pq.index(vecs, "vec_id", "embedding", coarse, cb, path)
    val q = Array.tabulate(8)(d => if (d < 4) 1.0 else 0.5)
    val served = Pq.probeIndexedRefined(spark, path, vecs, "vec_id",
      "embedding", q, topK = 5, nprobe = 1, shortlist = 10)
      .collect().toSeq
    val direct = Pq.ivfPqRefineTopK(vecs, "vec_id", "embedding", coarse,
      cb, q, topK = 5, nprobe = 1, shortlist = 10).collect().toSeq
    assert(served == direct)
  }

  test("probeManyIndexedRefined == per-query probeIndexedRefined on " +
    "both LUT transports") {
    val coarse = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, k = 4)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_manyref").toString + "/idx"
    Pq.index(vecs, "vec_id", "embedding", coarse, cb, path)
    val qs = Seq(
      (1L, Array.tabulate(8)(d => if (d < 4) 1.0 else 0.5)),
      (2L, Array.tabulate(8)(d => if (d < 4) -1.0 else -0.5)))
    val perQuery = qs.map { case (qid, q) =>
      qid -> Pq.probeIndexedRefined(spark, path, vecs, "vec_id",
        "embedding", q, topK = 5, nprobe = 1, shortlist = 10)
        .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    }.toMap
    for (lutMax <- Seq(Int.MaxValue, 0)) { // literal / join transports
      val many = Pq.probeManyIndexedRefined(spark, path, vecs, "vec_id",
        "embedding", qs, topK = 5, nprobe = 1, shortlist = 10,
        lutLiteralMax = lutMax)
      for ((qid, _) <- qs) {
        val batch = many.filter(col("query_id") === qid)
          .select("vec_id", "cosine_sim").collect().toSeq
          .map(r => (r.getLong(0), r.getDouble(1)))
          .sortBy { case (id, c) => (-c, id) }
        assert(batch == perQuery(qid), s"query $qid lutMax=$lutMax")
      }
    }
  }

  test("residual ivfpq: k=1 coarse degenerates to ADC on centered vectors") {
    val coarse = Ivf.Model(Array(Array.fill(8)(0.25)))
    val cb = Pq.trainResidual(vecs, "vec_id", "embedding", coarse,
      m = 2, dsub = 4, k = 4)
    val q = Array.tabulate(8)(d => if (d < 4) 1.0 else 0.5)
    val viaResidual = Pq.ivfPqResidualTopK(vecs, "vec_id", "embedding",
      coarse, cb, q, topK = 10, nprobe = 1).collect().toSeq
    // single cell -> residual = vec - c for every row: identical to plain
    // ADC over explicitly centered vectors with the centered query
    val centered = vecs.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE) - 0.25D)")
        .as("embedding"))
    val viaCentered = Pq.adcTopK(centered, "vec_id", "embedding", cb,
      q.map(_ - 0.25), topK = 10).collect().toSeq
    assert(viaResidual == viaCentered)
  }

  test("residual ivfpq: candidates only from probed cells; deterministic") {
    val coarse = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val cb = Pq.trainResidual(vecs, "vec_id", "embedding", coarse,
      m = 2, dsub = 4, k = 4)
    val q = Array.tabulate(8)(d => if (d < 4) 1.0 else 0.5)
    val qCell = coarse.nearest(q, 1).head
    val cells = Ivf.assign(vecs, "embedding", coarse)
      .select("vec_id", "__cluster").as[(Long, Int)].collect().toMap
    val top = Pq.ivfPqResidualTopK(vecs, "vec_id", "embedding", coarse,
      cb, q, topK = 10, nprobe = 1).select("vec_id").as[Long].collect()
    assert(top.nonEmpty && top.forall(cells(_) == qCell))
    val again = Pq.ivfPqResidualTopK(vecs, "vec_id", "embedding", coarse,
      cb, q, topK = 10, nprobe = 1).select("vec_id").as[Long].collect()
    assert(top.toSeq == again.toSeq)
  }

  test("pq indexAppend == all-at-once index for probes") {
    import org.apache.spark.sql.functions.col
    val coarse = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, k = 4)
    val p1 = java.nio.file.Files
      .createTempDirectory("graft_pq_app").toString + "/idx"
    Pq.index(vecs.filter(col("vec_id") < 20), "vec_id", "embedding",
      coarse, cb, p1)
    Pq.indexAppend(spark, p1, vecs.filter(col("vec_id") >= 20),
      "vec_id", "embedding")
    val p2 = java.nio.file.Files
      .createTempDirectory("graft_pq_full").toString + "/idx"
    Pq.index(vecs, "vec_id", "embedding", coarse, cb, p2)
    val q = Array.tabulate(8)(d => if (d < 4) 1.0 else 0.5)
    assert(
      Pq.probeIndexed(spark, p1, "vec_id", q, topK = 10).collect().toSeq ==
        Pq.probeIndexed(spark, p2, "vec_id", q, topK = 10).collect().toSeq)
  }

  test("encode plan is a pure projection (no exchange, no join)") {
    val cb = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, k = 4)
    val plan = Pq.encode(vecs, "embedding", cb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("sq8Train: empty corpus fails with the intended message") {
    // regression: head() on the empty frame used to throw
    // NoSuchElementException before the require could fire
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](Pq.sq8Train(empty, "embedding"))
    assert(e.getMessage.contains("non-empty corpus"))
  }

  test("sq8: codes in [0,255], reconstruction within half a step, degenerate dim -> 0") {
    // dim 0 spans [-3, 5], dim 1 is CONSTANT (scale 0), dim 2 spans [0, 1]
    val rows = Seq(
      (1L, Array(-3f, 7f, 0f)), (2L, Array(5f, 7f, 1f)),
      (3L, Array(1f, 7f, 0.5f)), (4L, Array(0.25f, 7f, 0.33f)))
    val df = rows.toDF("vec_id", "embedding")
    val m = Pq.sq8Train(df, "embedding")
    assert(m.mins.toSeq == Seq(-3.0, 7.0, 0.0))
    assert(m.scales(1) == 0.0)
    val codes = Pq.sq8Encode(df, "vec_id", "embedding", m)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.flatten.forall(c => c >= 0 && c <= 255))
    // extremes hit the rail codes exactly; the constant dim encodes 0
    assert(codes(1L) == Seq(0, 0, 0) && codes(2L)(0) == 255 &&
      codes(2L)(2) == 255)
    // reconstruction error bound: |v − (min + scale·code)| ≤ scale/2
    for ((id, v) <- rows; j <- 0 until 3 if m.scales(j) > 0) {
      val vh = m.mins(j) + m.scales(j) * codes(id)(j)
      assert(math.abs(v(j) - vh) <= m.scales(j) / 2 + 1e-9,
        s"id=$id dim=$j v=${v(j)} vhat=$vh")
    }
  }

  test("sq8TopK: dequantized ranking matches exact brute force on angle-separated data") {
    // vectors at distinct angles in a 2-D subspace (well-separated in
    // cosine, unlike scalar multiples which all tie at 1.0): id i sits
    // at angle i·10°, the query at 0° — exact top-5 is ids 0..4
    val angled = (0 until 18).map { i =>
      val t = math.toRadians(i * 10.0)
      (i.toLong, Array(math.cos(t).toFloat, math.sin(t).toFloat, 0.3f, 0.3f))
    }.toDF("vec_id", "embedding")
    val m = Pq.sq8Train(angled, "embedding")
    val codes = Pq.sq8Encode(angled, "vec_id", "embedding", m)
    val q = Array(1.0, 0.0, 0.3, 0.3)
    val approx = Pq.sq8TopK(codes, "vec_id", "codes", m, q, topK = 5)
      .select("vec_id").as[Long].collect().toSeq
    val exact = Similarity.bruteForceTopK(angled, "vec_id", "embedding",
      q, 5).select("vec_id").as[Long].collect().toSeq
    // 10° separation dwarfs the 1/255-step reconstruction error: the
    // ORDERED top-5 survives quantization
    assert(approx == exact && exact == Seq(0L, 1L, 2L, 3L, 4L),
      s"approx=$approx exact=$exact")
  }

  test("sq8TopKMany == sq8TopK per query (the batched serving form)") {
    val angled = (0 until 18).map { i =>
      val t = math.toRadians(i * 10.0)
      (i.toLong, Array(math.cos(t).toFloat, math.sin(t).toFloat, 0.3f, 0.3f))
    }.toDF("vec_id", "embedding")
    val m = Pq.sq8Train(angled, "embedding")
    val codes = Pq.sq8Encode(angled, "vec_id", "embedding", m)
    // three queries at different angles, served as ONE batch
    val qs = Seq(0, 60, 140).map { deg =>
      val t = math.toRadians(deg.toDouble)
      (deg.toLong, Array(math.cos(t), math.sin(t), 0.3, 0.3))
    }
    val batched = Pq.sq8TopKMany(codes, "vec_id", "codes", m, qs, topK = 4)
      .select("query_id", "vec_id", "est_cosine")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(r => (-r.getDouble(2), r.getLong(1)))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
    for ((qid, q) <- qs) {
      val single = Pq.sq8TopK(codes, "vec_id", "codes", m, q, topK = 4)
        .select("vec_id", "est_cosine")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batched(qid) == single,
        s"query $qid: batched ${batched(qid)} != single $single")
    }
    // and the plan stays join-free: one scan, a Generate, a window —
    // no nested-loop join sneaks in via the query batch
    val plan = Pq.sq8TopKMany(codes, "vec_id", "codes", m, qs, topK = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(500))
  }
}
