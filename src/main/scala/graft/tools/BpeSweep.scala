package graft.tools

import org.apache.spark.sql.SparkSession

/** Merge-count sweep for BPE training (VERDICT r15 #4): strict
  * one-merge-per-round-trip vs the batched trainer at tokenizer-ish
  * merge counts. Prints wall seconds, sec/merge, and (batched) the
  * aggregate-round count — the slope that says whether the driver
  * loop or the vocab-table pass dominates as merges grow.
  *
  * Usage: BpeSweep [sfDir] [maxBatched] — strict runs 8/64, batched
  * runs 8/64/256/maxBatched (default 2048).
  */
object BpeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val maxB = if (args.length > 1) args(1).toInt else 2048
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.read(spark, sfDir, "documents")
      .select("text").cache()
    docs.count() // warm the input out of the timing

    def time(fn: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = fn
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // one warm-up for codegen/JIT
    graft.ops.TextOps.bpeTrain(docs, "text", 2).count()

    Seq(8, 64).foreach { m =>
      val (sec, n) = time(graft.ops.TextOps.bpeTrain(docs, "text", m)
        .count())
      println(f"BPESWEEP kind=strict merges=$m got=$n wall=$sec%.2f " +
        f"sec_per_merge=${sec / m}%.4f")
    }
    (Seq(8, 64, 256) :+ maxB).distinct.sorted.foreach { m =>
      val (sec, n) = time(
        graft.ops.TextOps.bpeTrainBatched(docs, "text", m, batchN =
          sys.env.getOrElse("BPE_BATCH_N", "4096").toInt).count())
      val rounds = graft.core.Metrics.get("bpe_batched", "rounds")
        .map(_.sum).getOrElse(-1.0)
      println(f"BPESWEEP kind=batched merges=$m got=$n wall=$sec%.2f " +
        f"sec_per_merge=${sec / m}%.4f rounds=${rounds.toLong} " +
        f"merges_per_round=${n / math.max(rounds, 1)}%.1f")
    }
    spark.stop()
  }
}
