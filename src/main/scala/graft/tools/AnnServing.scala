package graft.tools

import graft.Tables
import graft.ops.{Ivf, Pq}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-latency operating points for the persisted ANN indexes
  * under CONCURRENT load — the row the 100 TB serving claim needs
  * beyond RECALL.md's recall and single-stream batch amortization:
  * what p50/p95 does a probe request see when 1 / 8 / 32 requests are
  * in flight?
  *
  * Protocol: a REQUEST is one batched probe of `batch` queries —
  * [[Ivf.probeMany]] (nprobe=4, the measured 0.84-recall served
  * operating point) against the partition-pruned IVF index, and
  * [[Pq.sq8TopKMany]] (one 1-byte/dim codes scan amortized across the
  * batch) against the persisted SQ8 codes. Queries are md5-ordered
  * corpus members (deterministic). Per concurrency level C, a fixed
  * pool of C threads drives `nRequests` requests (Spark schedules the
  * concurrent jobs; FAIR mode so no request starves behind a long
  * stage); each request times its own submit→collect wall. Warmups are
  * untimed. p50/p95 over per-request walls; queries/s over the level's
  * total wall.
  *
  * The measurement core is [[run]] — `main` writes the RECALL.md
  * section, Bench embeds the same numbers as artifact fields.
  */
object AnnServing {

  def percentile(sorted: IndexedSeq[Double], p: Double): Double =
    if (sorted.isEmpty) -1.0
    else sorted(math.min(sorted.length - 1,
      math.ceil(p / 100.0 * sorted.length).toInt - 1).max(0))

  final case class Level(form: String, concurrency: Int, p50Ms: Double,
      p95Ms: Double, queriesPerSec: Double)

  /** Measure all (form × concurrency) levels. Builds throwaway indexes
    * under a temp dir (build time excluded); cleans up after. */
  def run(spark: SparkSession, sfDir: String, nRequests: Int = 32,
      batch: Int = 16, concurrencies: Seq[Int] = Seq(1, 8, 32),
      k: Int = 10): Seq[Level] = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ann_serving").toString
    val idxPath = dir + "/ivf"
    val codesPath = dir + "/sq8"
    try {
      val emb = Tables.read(spark, sfDir, "embeddings").cache()
      val model = Ivf.train(emb, "vec_id", "embedding", k = 16, iters = 2)
      Ivf.index(emb, "embedding", model, idxPath)
      val sq8 = Pq.sq8Train(emb, "embedding")
      Pq.sq8Encode(emb, "vec_id", "embedding", sq8)
        .write.parquet(codesPath)
      // deterministic query pool: md5-ordered corpus vectors, wrapped
      // round-robin into nRequests batches of `batch`
      val pool = emb
        .orderBy(md5(concat(lit("serve:"), col("vec_id").cast("string"))),
          col("vec_id"))
        .limit(nRequests * batch).select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toArray))
      emb.unpersist()
      val requests: IndexedSeq[Seq[(Long, Array[Double])]] =
        (0 until nRequests).map(i =>
          (0 until batch).map(j => pool((i * batch + j) % pool.length)))

      def ivfRequest(qs: Seq[(Long, Array[Double])]): Unit = {
        Ivf.probeMany(spark, idxPath, "vec_id", "embedding", qs, k,
          nprobe = 4).collect()
        ()
      }
      def sq8Request(qs: Seq[(Long, Array[Double])]): Unit = {
        Pq.sq8TopKMany(spark.read.parquet(codesPath), "vec_id", "codes",
          sq8, qs, k).collect()
        ()
      }

      def level(form: String, body: Seq[(Long, Array[Double])] => Unit,
          c: Int): Level = {
        (1 to 3).foreach(i => body(requests(i % nRequests))) // warm
        val pool = java.util.concurrent.Executors.newFixedThreadPool(c)
        val latencies =
          new java.util.concurrent.ConcurrentLinkedQueue[Double]()
        val t0 = System.nanoTime()
        try {
          val futures = requests.map { qs =>
            pool.submit(new Runnable {
              def run(): Unit = {
                val s = System.nanoTime()
                body(qs)
                latencies.add((System.nanoTime() - s) / 1e6)
              }
            })
          }
          futures.foreach(_.get())
        } finally pool.shutdown()
        val wallSec = (System.nanoTime() - t0) / 1e9
        import scala.jdk.CollectionConverters._
        val sorted = latencies.asScala.toIndexedSeq.sorted
        Level(form, c, percentile(sorted, 50), percentile(sorted, 95),
          nRequests.toLong * batch / wallSec)
      }

      for {
        (form, body) <- Seq(
          "ivf nprobe=4" -> (ivfRequest _),
          "sq8 codes scan" -> (sq8Request _))
        c <- concurrencies
      } yield level(form, body, c)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  /** Flat metric map for the bench artifact:
    * `<form>_p50_ms_c<N>` / `<form>_p95_ms_c<N>` / `<form>_qps_c<N>`. */
  def metrics(levels: Seq[Level]): Map[String, Double] =
    levels.flatMap { l =>
      val f = if (l.form.startsWith("ivf")) "ivf" else "sq8"
      Seq(s"${f}_p50_ms_c${l.concurrency}" -> l.p50Ms,
        s"${f}_p95_ms_c${l.concurrency}" -> l.p95Ms,
        s"${f}_qps_c${l.concurrency}" -> l.queriesPerSec)
    }.toMap

  private val Begin = "<!-- serving-latency:begin -->"
  private val End = "<!-- serving-latency:end -->"

  def section(levels: Seq[Level], sfDir: String, nRequests: Int,
      batch: Int): String = {
    // rows are concatenated OUTSIDE stripMargin — inside it, the
    // margin strip would eat each table row's leading pipe
    val rows = levels.map(l =>
      f"| ${l.form} | ${l.concurrency} | ${l.p50Ms}%.0f | ${l.p95Ms}%.0f " +
        f"| ${l.queriesPerSec}%.0f |").mkString("\n")
    s"""$Begin
       |## Serving latency under concurrency
       |
       |Generated by `graft.tools.AnnServing` ($sfDir; $nRequests
       |requests of $batch queries per level; request = one batched
       |probe, per-request submit→collect wall; FAIR scheduler). IVF is
       |the partition-pruned probeMany at the nprobe=4 served operating
       |point; sq8 is the 1-byte/dim codes scan through sq8TopKMany.
       |p50/p95 are per-request; queries/s is the level's aggregate.
       |Single-stream latency and recall for the same forms live in the
       |sections above — this table adds what CONCURRENT load does to
       |the tail, the operating row a resident serving job is sized by.
       |
       || form | in-flight | p50 (ms) | p95 (ms) | queries/s |
       ||---|---|---|---|---|
       |""".stripMargin + rows + "\n" + End
  }

  /** Patch RECALL.md: replace the marker-delimited section, else
    * append (AnnRecall regenerates the file without it — re-run this
    * after re-running AnnRecall). */
  def patchRecallMd(sectionText: String): Unit = {
    val p = java.nio.file.Paths.get("RECALL.md")
    val cur =
      if (java.nio.file.Files.exists(p))
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      else ""
    val next =
      if (cur.contains(Begin) && cur.contains(End)) {
        val pre = cur.substring(0, cur.indexOf(Begin))
        val post = cur.substring(cur.indexOf(End) + End.length)
        pre + sectionText + post
      } else cur + "\n" + sectionText + "\n"
    java.nio.file.Files.write(p, next.getBytes("UTF-8"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-ann-serving")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nRequests =
      sys.env.getOrElse("SPARK_GRAFT_SERVING_REQUESTS", "32").toInt
    val levels = run(spark, sfDir, nRequests = nRequests)
    val text = section(levels, sfDir, nRequests, 16)
    patchRecallMd(text)
    println(text)
    spark.stop()
  }
}
