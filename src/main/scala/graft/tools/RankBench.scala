package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-pass-rank crossover, MEASURED (not just plan-reasoned): per-
  * group rank over a synthetic corpus with provenance-cardinality groups,
  * window form vs [[graft.ops.Ranks.grouped]]. At sf0.1 catalog sizes the
  * fixed overhead hides the difference; here the group row-counts are
  * large enough that the window form's one-reducer-per-group sort
  * dominates wall even on local[32] — the local proxy for the shape that
  * simply never finishes at 100 TB.
  *
  * Two distributions:
  *  - balanced: `groups` groups × rows/groups each;
  *  - skewed: one group carries 90% of the corpus (the crawl-dump case).
  *
  * Rows are generated distributed (spark.range — nothing driver-side);
  * both forms compute the identical (rank, running sum) and sink to noop.
  * Reported wall is the min of `runs` (JIT/warm-up discipline as Bench).
  *
  * Usage: `runMain graft.tools.RankBench [rows] [groups] [runs]` */
object RankBench {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 20000000L
    val nGroups = if (args.length > 1) args(1).toInt else 4
    val nRuns = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-rank-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)

    def corpus(skewed: Boolean): DataFrame = {
      val g =
        if (skewed)
          // id % 10: residues 0..8 -> group 0 (90%), residue 9 spread
          when(col("id") % 10 < 9, lit("g0"))
            .otherwise(concat(lit("g"), (col("id") % nGroups).cast("string")))
        else concat(lit("g"), (col("id") % nGroups).cast("string"))
      spark.range(nRows).select(col("id"), g.as("g"),
        (col("id") % 13 + 1).as("w"))
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def best(body: => Unit): Double = (1 to nRuns).map(_ => time(body)).min

    def windowForm(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("g"))
        .orderBy(graft.functions.Portable.h60(col("id").cast("string")),
          col("id"))
      df.withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("w")).over(w))
        .select("id", "rk", "cum")
    }
    def twoPass(df: DataFrame): DataFrame =
      graft.ops.Ranks.grouped(df, Seq("g"),
          Seq(graft.functions.Portable.h60(col("id").cast("string")),
            col("id")),
          rankCol = Some("rk"),
          sums = Seq(graft.ops.Ranks.RunSum(col("w"), "cum")))
        .select("id", "rk", "cum")

    Seq(false, true).foreach { skewed =>
      val label = if (skewed) "skewed-90pct" else "balanced"
      val df = corpus(skewed)
      val wSec = best {
        windowForm(df).write.format("noop").mode("overwrite").save()
      }
      val tSec = best {
        twoPass(df).write.format("noop").mode("overwrite").save()
        graft.core.Metrics.drainUnpersist()
      }
      println(f"RANKBENCH dist=$label rows=$nRows groups=$nGroups " +
        f"window_sec=$wSec%.2f twopass_sec=$tSec%.2f " +
        f"speedup=${wSec / tSec}%.2fx")
    }

    // the small-k fast path at the same scale: rank-all-then-filter vs
    // the bounded map-side top-k aggregate (k pairs per mapper per
    // group on the wire instead of the corpus)
    val dfb = corpus(skewed = false)
    val k = 20
    val rankAll = best {
      graft.ops.Sampling.stratified(dfb.select("g", "id"), Seq("g"),
        "id", k).write.format("noop").mode("overwrite").save()
      graft.core.Metrics.drainUnpersist()
    }
    val topK = best {
      graft.ops.Sampling.stratifiedTopK(dfb.select("g", "id"), Seq("g"),
        "id", k).write.format("noop").mode("overwrite").save()
    }
    println(f"RANKBENCH topk k=$k rows=$nRows rank_all_sec=$rankAll%.2f " +
      f"topk_agg_sec=$topK%.2f speedup=${rankAll / topK}%.2fx")
    spark.stop()
  }
}
