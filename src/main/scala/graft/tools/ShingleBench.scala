package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The [[graft.ops.Dedup.crossDocShingleFrac]] document-frequency shape,
  * MEASURED under hot-shingle skew (VERDICT r13 #4): the shipped form
  * counts document frequency with `count over Window.partitionBy(shingle)`
  * (one exchange; every occurrence of a hot shingle BUFFERS on one window
  * task), the alternative is `groupBy(shingle).count` + an equi-join back
  * (the count map-side combines, so the hot shingle collapses to one row
  * per input partition before the exchange; the join side can be
  * broadcast when the distinct-shingle frame is small, and AQE can
  * skew-split an SMJ — a window can never be split).
  *
  * Two distributions over a synthetic (doc, shingle) occurrence stream:
  *  - balanced: occurrences uniform over a large shingle vocabulary;
  *  - skewed: 90% of occurrences land on 5 hot shingles (the
  *    boilerplate-navbar case the operator exists to detect).
  *
  * Both forms compute identical per-doc (n_shingles, n_dup) aggregates
  * and sink to noop; wall is min of `runs` (Bench's warm-up discipline).
  *
  * Usage: `runMain graft.tools.ShingleBench [rows] [runs]` */
object ShingleBench {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 20000000L
    val nRuns = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-shingle-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ~50 shingle occurrences per document; floor at 1 so a tiny nRows
    // never makes `col("id") % docs` a modulo-by-zero (ADVICE r14)
    val docs = math.max(1L, nRows / 50)
    // (tag, hot shingle count, per-mille of the stream that is hot):
    // skew90/5 is the crawl-boilerplate case; skew99/1 is the worst
    // case — ONE navbar gram in ~every document, the single-task
    // window buffer at its purest
    val scenarios = Seq(("balanced", 0, 0), ("skew90x5", 5, 900),
      ("skew99x1", 1, 990))
    def stream(hotN: Int, permille: Int): DataFrame = {
      val tail = concat(lit("s"), (col("id") % 200000).cast("string"))
      val sh =
        if (hotN == 0) tail
        else when(col("id") % 1000 < permille,
          concat(lit("hot"), (col("id") % hotN).cast("string")))
          .otherwise(tail)
      spark.range(nRows)
        .select((col("id") % docs).as("id"), sh.as("shingle"))
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def best(body: => Unit): Double = (1 to nRuns).map(_ => time(body)).min

    val minDf = 2
    def perDoc(withDf: DataFrame): DataFrame =
      withDf.groupBy("id").agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= minDf, 1L).otherwise(0L)).as("n_dup"))

    def windowForm(df: DataFrame): DataFrame =
      perDoc(df.withColumn("__df",
        count(lit(1)).over(Window.partitionBy(col("shingle")))))

    def aggJoinForm(df: DataFrame): DataFrame = {
      val dfs = df.groupBy("shingle").agg(count(lit(1)).as("__df"))
      perDoc(df.join(dfs, Seq("shingle")))
    }

    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for ((tag, hotN, permille) <- scenarios) {
      val in = stream(hotN, permille)
      val w = best(sink(windowForm(in)))
      val aj = best(sink(aggJoinForm(in)))
      println(f"$tag%-9s rows=$nRows window=$w%.2f s aggjoin=$aj%.2f s " +
        f"ratio=${w / aj}%.2fx")
    }
    spark.stop()
  }
}
