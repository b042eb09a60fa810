package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The span/paragraph WINNER shape ([[graft.ops.Dedup.dedupParagraphs]] /
  * `duplicateSpans(keepFirst)`), measured under hot-key skew across a
  * rows grid — VERDICT r14 #3: ShingleBench proved the df-COUNTING
  * rewire's slope; the winner rewire (`min(struct(id, pos))` per key +
  * join-back, replacing `row_number over Window.partitionBy(key)`)
  * shares the exchange shape but not the measurement.
  *
  * Synthetic (key, id, pos) occurrence stream — key = paragraph hash /
  * n-gram window key; ~20 occurrences per document:
  *  - balanced: keys ~uniform over a 200k vocabulary;
  *  - skew90x5: 90% of occurrences on 5 hot keys (crawl boilerplate);
  *  - skew99x1: 99% on ONE key (the corpus-wide footer — the
  *    single-task window buffer at its purest).
  *
  * Both forms compute identical per-doc (n_kept, n_dup) aggregates and
  * sink to noop; wall = min of `runs`.
  *
  * Usage: `runMain graft.tools.SpanBench [rows] [runs] [skipWindowAbove]`
  * (the window form is SKIPPED above `skipWindowAbove` rows on skewed
  * scenarios — at 80M×99%-hot it buffers 79M rows on one task and the
  * grid would spend its whole budget proving a known superlinearity). */
object SpanBench {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 20000000L
    val nRuns = if (args.length > 1) args(1).toInt else 3
    val skipWindowAbove =
      if (args.length > 2) args(2).toLong else 100000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-span-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = math.max(1L, nRows / 20) // ~20 paragraphs per document
    val scenarios = Seq(("balanced", 0, 0), ("skew90x5", 5, 900),
      ("skew99x1", 1, 990))
    def stream(hotN: Int, permille: Int): DataFrame = {
      val tail = concat(lit("k"), (col("id") % 200000).cast("string"))
      val key =
        if (hotN == 0) tail
        else when(col("id") % 1000 < permille,
          concat(lit("hot"), (col("id") % hotN).cast("string")))
          .otherwise(tail)
      spark.range(nRows).select(
        (col("id") % docs).as("id"),
        (col("id") / docs).cast("long").as("pos"),
        key.as("key"))
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def best(body: => Unit): Double = (1 to nRuns).map(_ => time(body)).min

    // identical downstream: per-doc counts of winner/loser occurrences
    def perDoc(marked: DataFrame): DataFrame =
      marked.groupBy("id").agg(
        sum(when(col("__is1"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("__is1"), 1L).otherwise(0L)).as("n_dup"))

    // r13 shape: rank-1 via a key-partitioned window (hot key -> one task)
    def windowForm(df: DataFrame): DataFrame =
      perDoc(df.withColumn("__rn", row_number().over(
          Window.partitionBy(col("key"))
            .orderBy(col("id"), col("pos"))))
        .withColumn("__is1", col("__rn") === 1))

    // shipped shape: map-side-combined min(struct) winner + join-back
    def aggJoinForm(df: DataFrame): DataFrame = {
      val winners = df.groupBy("key")
        .agg(min(struct(col("id"), col("pos"))).as("__w"))
      perDoc(df.join(winners, Seq("key"))
        .withColumn("__is1",
          struct(col("id"), col("pos")) === col("__w")))
    }

    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for ((tag, hotN, permille) <- scenarios) {
      val in = stream(hotN, permille)
      val skipW = hotN > 0 && nRows > skipWindowAbove
      val w = if (skipW) -1.0 else best(sink(windowForm(in)))
      val aj = best(sink(aggJoinForm(in)))
      val ratio = if (w > 0) f"${w / aj}%.2fx" else "skipped"
      println(f"$tag%-9s rows=$nRows window=$w%.2f s aggjoin=$aj%.2f s " +
        s"ratio=$ratio")
    }
    spark.stop()
  }
}
