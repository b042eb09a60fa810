package graft.tools

import org.apache.spark.sql.SparkSession

/** Executes every catalog query (sf0.001 by default) and prints one
  * line per query with duplicate-subtree signals from the FINAL
  * adaptive plan: parquet scan count, explode/posexplode Generate
  * count, regex-tokenize subtree count, and runtime reuse nodes. The
  * r19 repeated-pass audit: a query whose final plan scans the same
  * table many times with zero reuse is re-computing a shared frame per
  * consumer (the Dsir/SemDedup/topKeywords finding). */
object ReuseAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        graft.core.Metrics.drainUnpersist()
        def c(pat: String) = pat.r.findAllIn(p).length
        val scans = c("Scan parquet")
        val rdds = c("Scan ExistingRDD")
        val gens = c("Generate ")
        // ADVICE r19: count the names Spark's physical plans actually
        // emit — split_regex is the DuckDB oracle's spelling (never in
        // a Spark plan), and the old ShuffleQueryStage lookahead could
        // not match across lines, so it counted nothing
        val tok = c("split\\(|regexp_replace")
        val reuse = c("ReusedExchange|ReusedQueryStage")
        println(f"[reuse] $n%-28s scans=$scans%-3d rdd=$rdds%-3d gen=$gens%-3d tokenize=$tok%-3d reuse=$reuse")
      } catch {
        case e: Throwable =>
          println(s"[reuse] $n ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
