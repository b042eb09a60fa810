package graft.tools

import org.apache.spark.sql.SparkSession

/** Merge-count sweep for BPE training (VERDICT r15 #4, extended r17
  * per VERDICT r16 #6): strict one-merge-per-round-trip vs the batched
  * trainer at tokenizer-ish merge counts. Prints wall seconds,
  * sec/merge, and (batched) the aggregate-round count — the slope that
  * says whether the driver loop or the vocab-table pass dominates as
  * merges grow.
  *
  * Two fixtures:
  *  - `docs` — documents.text as-is (the r15/r16 baseline; its
  *    character vocabulary fully merges at ~89, so deeper walls
  *    measure nothing there — the honest r16 finding);
  *  - `longtail` — deterministic mixed-domain corpus from the SAME
  *    testdata: every adjacent word pair of documents.text fused into
  *    a compound word (bigram frequencies are zipf with a long tail —
  *    the regime real tokenizer corpora have), unioned with the raw
  *    text and part name/type words. Sustains 512+ real merges, so
  *    the merges-per-round curve finally measures the hazard rule on
  *    the data shape it was designed for.
  *
  * Usage: BpeSweep [sfDir] [maxBatched] — strict runs 8/64 on both
  * fixtures, batched runs 8/64/256/512/maxBatched (default 2048) on
  * both.
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
    import org.apache.spark.sql.functions._

    val docs = graft.Tables.read(spark, sfDir, "documents")
      .select("text").cache()
    docs.count() // warm the input out of the timing

    // long-tail fixture: adjacent-word compounds carry the bigram
    // distribution's zipf tail; raw text keeps the unigram head
    val toks = docs.select(split(coalesce(col("text"), lit("")), " ")
      .as("t"))
    val longtail = toks.select(concat_ws(" ", zip_with(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
        (a, b) => concat(a, b))).as("text"))
      .unionByName(docs)
      .unionByName(graft.Tables.read(spark, sfDir, "part")
        .select(concat_ws(" ", col("p_name"), col("p_type")).as("text")))
      .cache()
    longtail.count()

    def time(fn: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = fn
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // one warm-up for codegen/JIT
    graft.ops.TextOps.bpeTrain(docs, "text", 2).count()

    for ((fx, df) <- Seq("docs" -> docs, "longtail" -> longtail)) {
      Seq(8, 64).foreach { m =>
        val (sec, n) = time(graft.ops.TextOps.bpeTrain(df, "text", m)
          .count())
        println(f"BPESWEEP fixture=$fx kind=strict merges=$m got=$n " +
          f"wall=$sec%.2f sec_per_merge=${sec / m}%.4f")
      }
      (Seq(8, 64, 256, 512) :+ maxB).distinct.sorted.foreach { m =>
        val (sec, n) = time(
          graft.ops.TextOps.bpeTrainBatched(df, "text", m, batchN =
            sys.env.getOrElse("BPE_BATCH_N", "4096").toInt).count())
        val rounds = graft.core.Metrics.get("bpe_batched", "rounds")
          .map(_.sum).getOrElse(-1.0)
        println(f"BPESWEEP fixture=$fx kind=batched merges=$m got=$n " +
          f"wall=$sec%.2f sec_per_merge=${sec / m}%.4f " +
          f"rounds=${rounds.toLong} " +
          f"merges_per_round=${n / math.max(rounds, 1)}%.1f")
      }
    }
    spark.stop()
  }
}
