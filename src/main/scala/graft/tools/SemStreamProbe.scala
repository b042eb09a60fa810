package graft.tools

import graft.ops.Ivf
import org.apache.spark.sql.SparkSession

/** Throughput probe for SemDedupStream.processBatch — the bench's shape
  * (seeded near-dup/novel mix) without the MemoryStream scaffolding, so
  * an A/B isolates the trigger body. Prints events/s and phase totals. */
object SemStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val per = if (args.length > 1) args(1).toInt else 2000
    val nB = if (args.length > 2) args(2).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files
      .createTempDirectory("graft_semprobe").toString
    val idxPath = dir + "/idx"
    val emb = graft.Tables.read(spark, sfDir, "embeddings").cache()
    val corpus = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val model = Ivf.train(emb, "vec_id", "embedding", k = 16, iters = 2)
    Ivf.index(emb, "embedding", model, idxPath)
    emb.unpersist()
    val dim = corpus.head._2.length
    val rnd = new scala.util.Random(42)
    var nextId = corpus.map(_._1).max + 1
    val batches = (0 until nB).map { _ =>
      (0 until per).map { i =>
        val id = nextId; nextId += 1
        if (i % 2 == 0) {
          val (_, base) = corpus(rnd.nextInt(corpus.length))
          (id, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f))
        } else (id, Array.fill(dim)(rnd.nextFloat() * 2 - 1))
      }
    }
    if (sys.env.contains("SEMPROBE_EXPLAIN")) {
      // attribution harness: time the fused pair join with the full ref,
      // corpus-only ref, and batch-only ref — which side carries the cost?
      import org.apache.spark.sql.functions._
      val batch = batches.head.toDF("vec_id", "embedding").localCheckpoint()
      val a = Ivf.assign(batch, "embedding", model)
        .select(col("vec_id").as("__bid"), col("embedding").as("__bvec"),
          sqrt(graft.ops.Similarity.dot(col("embedding"), col("embedding")))
            .as("__bnrm"),
          col("__cluster").as("__bcell")).localCheckpoint()
      val cells = (0 until 16)
      val corpusRef = spark.read.parquet(idxPath)
        .filter(col(Ivf.CellCol).isin(cells: _*))
        .select(col("vec_id").as("__rid"), col("embedding").as("__rvec"),
          sqrt(graft.ops.Similarity.dot(col("embedding"), col("embedding")))
            .as("__rnrm"),
          col(Ivf.CellCol).as("__rcell"), lit(true).as("__rcorp"))
      val batchRef = a.select(col("__bid").as("__rid"),
        col("__bvec").as("__rvec"), col("__bnrm").as("__rnrm"),
        col("__bcell").as("__rcell"), lit(false).as("__rcorp"))
      val sim = when(col("__rnrm") * col("__bnrm") > 0,
        graft.ops.Similarity.dot(col("__rvec"), col("__bvec")) /
          (col("__rnrm") * col("__bnrm"))).otherwise(lit(0.0))
      def joinOf(ref: org.apache.spark.sql.DataFrame) = ref
        .repartition(32)
        .join(broadcast(a), col("__rcell") === col("__bcell") && (
          (col("__rcorp") && col("__rid") === col("__bid")) ||
            ((col("__rcorp") || col("__rid") < col("__bid")) &&
              sim >= 0.9)))
        .select(col("__bid"), col("__rid"),
          when(col("__rcorp") && col("__rid") === col("__bid"), lit("g"))
            .when(col("__rcorp"), lit("c"))
            .otherwise(lit("w")).as("__kind"))
      val variants = Seq(
        "full" -> corpusRef.unionByName(batchRef),
        "corpus-only" -> corpusRef,
        "batch-only" -> batchRef)
      variants.foreach { case (name, ref) =>
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val n = joinOf(ref).count()
          println(f"  variant=$name%-12s run$i n=$n " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
      // the STREAM's exact shape + bisection variants
      def streamShape(name: String, eagerBatch: Boolean, ckptA: Boolean,
          endCkpt: Boolean): Unit = (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val b2 = batches.head.toDF("vec_id", "embedding")
          .localCheckpoint(eagerBatch)
        val a2x = Ivf.assign(b2, "embedding", model)
          .select(col("vec_id").as("__bid"), col("embedding").as("__bvec"),
            sqrt(graft.ops.Similarity.dot(col("embedding"), col("embedding")))
              .as("__bnrm"),
            col("__cluster").as("__bcell"))
        val a2 = if (ckptA) a2x.localCheckpoint() else a2x
        a2.groupBy("__bcell").count().collect()
        val br2 = a2.select(col("__bid").as("__rid"),
          col("__bvec").as("__rvec"), col("__bnrm").as("__rnrm"),
          col("__bcell").as("__rcell"), lit(false).as("__rcorp"))
        val j = corpusRef.unionByName(br2).repartition(32)
          .join(broadcast(a2), col("__rcell") === col("__bcell") && (
            (col("__rcorp") && col("__rid") === col("__bid")) ||
              ((col("__rcorp") || col("__rid") < col("__bid")) &&
                sim >= 0.9)))
          .select(col("__bid"), col("__rid"),
            when(col("__rcorp") && col("__rid") === col("__bid"), lit("g"))
              .when(col("__rcorp"), lit("c"))
              .otherwise(lit("w")).as("__kind"))
        val n = if (endCkpt) { val p2 = j.localCheckpoint()
          val c = p2.count(); p2.unpersist(); c } else j.count()
        println(f"  variant=$name%-24s run$i n=$n " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
        b2.unpersist()
      }
      streamShape("stream-shape", eagerBatch = false, ckptA = false,
        endCkpt = true)
      streamShape("stream+eagerBatch", eagerBatch = true, ckptA = false,
        endCkpt = true)
      streamShape("stream+ckptA", eagerBatch = false, ckptA = true,
        endCkpt = true)
      streamShape("stream+count", eagerBatch = false, ckptA = false,
        endCkpt = false)
      println(joinOf(corpusRef.unionByName(batchRef))
        .queryExecution.executedPlan.toString.take(3000))
      spark.stop()
      return
    }
    if (sys.env.contains("SEMPROBE_JOBS")) {
      // per-job wall + task counts: which scheduled jobs compose each
      // trigger phase (the floor is job count × per-job overhead)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            scala.collection.concurrent.TrieMap[Int, Long]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts(j.jobId) = System.nanoTime()
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            starts.remove(j.jobId).foreach { t =>
              System.err.println(
                f"[job] id=${j.jobId} wall=${(System.nanoTime() - t) / 1e9}%.3f")
            }
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val i = s.stageInfo
            val wall = (for {a <- i.completionTime; b <- i.submissionTime}
              yield (a - b) / 1e3).getOrElse(-1.0)
            System.err.println(f"[stage] id=${i.stageId} " +
              f"tasks=${i.numTasks} wall=$wall%.3f " +
              f"taskSum=${i.taskMetrics.executorRunTime / 1e3}%.3f " +
              f"name=${i.name.take(40)}")
          }
        })
    }
    val s = new graft.streaming.SemDedupStream(spark, idxPath,
      "vec_id", "embedding", threshold = 0.9, compactEvery = 4)
    val t0 = System.nanoTime()
    var prev = Map.empty[String, Double].withDefaultValue(0.0)
    batches.zipWithIndex.foreach { case (b, i) =>
      val tb = System.nanoTime()
      s.processBatch(b.toDF("vec_id", "embedding"), i)
      val cur = s.phaseTotals.withDefaultValue(0.0)
      println(f"  batch $i wall=${(System.nanoTime() - tb) / 1e9}%.2f " +
        cur.keys.toSeq.sorted
          .map(k => f"$k=${cur(k) - prev(k)}%.2f").mkString(" "))
      prev = cur
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val (nb, app, drop) = s.stats
    println(f"SEMPROBE batches=$nb events=${nB * per} sec=$sec%.2f " +
      f"eps=${nB * per / sec}%.0f appended=$app dropped=$drop " +
      s"phases=${s.phaseTotals.map { case (k, v) => f"$k=$v%.2f" }.mkString(",")}")
    spark.stop()
  }
}
