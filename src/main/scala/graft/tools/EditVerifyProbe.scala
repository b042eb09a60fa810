package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** One-off funnel probe for q_x_lsh_editverify: how many candidate pairs
  * the banded MinHash stage emits, how many survive each Ed-Join-style
  * prefilter, and how many the final edit-sim threshold keeps — the
  * numbers that decide which verify-stage filter is worth its cost. */
object EditVerifyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-editverify-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.read(spark, sfDir, "documents")
    val (n, numHashes, bands, est, minEditSim, maxChars) =
      (3, 64, 16, 0.3, 0.4, 400)
    val cand = graft.ops.Dedup.minHashCandidatesPortable(
      docs, "doc_id", "text", n, numHashes, bands, est).localCheckpoint()
    val txt = docs.select(col("doc_id").as("id"),
      substring(coalesce(col("text"), lit("")), 1, maxChars).as("t"))
    val limit = math.ceil((1.0 - minEditSim) * maxChars).toInt
    val joined = cand
      .join(txt.select(col("id").as("id_a"), col("t").as("__ta")), "id_a")
      .join(txt.select(col("id").as("id_b"), col("t").as("__tb")), "id_b")
      .withColumn("__la", length(col("__ta")))
      .withColumn("__lb", length(col("__tb")))
      .withColumn("__maxlen", greatest(col("__la"), col("__lb")))
      // the per-pair budget the final filter implies
      .withColumn("__t", floor((lit(1.0) - lit(minEditSim)) *
        col("__maxlen").cast(DoubleType)).cast("int"))
      .localCheckpoint()
    val total = joined.count()
    val passLen = joined
      .filter(abs(col("__la") - col("__lb")) <= lit(limit)).count()
    val passLenPerPair = joined
      .filter(abs(col("__la") - col("__lb")) <= col("__t")).count()
    val passCountFilter = joined
      .filter(abs(col("__la") - col("__lb")) <= col("__t"))
      .filter(graft.functions.TextExprs
        .editLowerBound(col("__ta"), col("__tb")) <= col("__t")).count()
    val verified = joined
      .filter(abs(col("__la") - col("__lb")) <= col("__t"))
      .withColumn("__d", levenshtein(col("__ta"), col("__tb"), limit))
      .filter(col("__d") >= 0)
      .withColumn("edit_sim", when(col("__maxlen") === 0, lit(1.0))
        .otherwise(lit(1.0) - col("__d").cast(DoubleType) /
          col("__maxlen").cast(DoubleType)))
    val dPos = verified.count()
    val kept = verified.filter(col("edit_sim") >= minEditSim).count()
    val lens = joined.agg(
      min(col("__maxlen")), expr("percentile(__maxlen, 0.5)"),
      expr("percentile(__maxlen, 0.9)"), max(col("__maxlen")),
      avg(col("__maxlen"))).collect()(0)
    println(s"PROBE pairs=$total passLenConst=$passLen " +
      s"passLenPerPair=$passLenPerPair passCountFilter=$passCountFilter " +
      s"dNonNeg=$dPos kept=$kept " +
      s"maxlen[min/p50/p90/max/avg]=$lens constLimit=$limit")
    spark.stop()
  }
}
