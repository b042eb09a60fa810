package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Stage-boundary wall attribution for `q_x_pipeline` — which seam of
  * the chained curation pipeline carries the wall (the solo per-stage
  * catalog timings sum to ~2.3 s while the chain first measured 8.5 s;
  * the checkpoints closed most of the gap, this probe attributes the
  * rest). Times each stage AS MATERIALIZED (count/checkpoint), warm
  * (second run), mirroring the Bench session config. */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    import graft.ops.{CorpusStats, Dedup, Sampling, TextOps}

    def stage[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val t0 = coalesce(col("text"), lit(""))
      val damaged = when(pmod(col("doc_id"), lit(3)) === 0,
        replace(t0, lit("e"), lit("Ã©"))).otherwise(t0)
      val cleaned = stage("clean") {
        val c = graft.Tables.read(spark, sfDir, "documents")
          .select(col("doc_id"), col("source"),
            TextOps.repairMojibake(damaged).as("t"))
          .localCheckpoint()
        c
      }
      val deduped = Dedup.exactKeep(
        cleaned.withColumn("fp", TextOps.fingerprint(col("t"))),
        Seq("fp"), "doc_id")
      stage("dedup-count") { deduped.count() }
      val bench = cleaned.filter(col("doc_id") % 50 === 0).select(col("t"))
      val conta = Dedup.contamination(deduped, "doc_id", "t",
        bench, "t", n = 3, minHits = 1)
      val kept = stage("contaminate") {
        deduped.join(
            conta.filter(!col("contaminated"))
              .select(col("id").as("doc_id")),
            Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("source"),
            length(col("t")).cast(LongType).as("n_chars"))
          .localCheckpoint()
      }
      val gated = stage("qnorm-gate") {
        CorpusStats.quantileNormalize(kept, Seq("source"), "n_chars")
          .filter(col("q_norm") >= 0.2)
          .localCheckpoint()
      }
      val quotas = stage("waterfill") {
        val counts = gated.groupBy("source").agg(sum("n_chars").as("c"))
        Sampling.fairShareQuota(counts, "source", "c", 30000L)
          .select(col("source"), col("quota"))
      }
      val trimmed = stage("quota-trim") {
        Sampling.tokenBudgetByQuota(gated, "source", "doc_id",
            "n_chars", quotas)
          .localCheckpoint()
      }
      stage("interleave") {
        Sampling.interleave(trimmed, "source", "doc_id")
          .select(col("source"), col("doc_id"), col("n_chars"),
            col("q_norm"), col("cum_tokens"), col("quota"), col("pos"))
          .write.format("noop").mode("overwrite").save()
      }
      graft.core.Metrics.drainUnpersist()
    }
    spark.stop()
  }
}
