package graft.tools
import org.apache.spark.sql.SparkSession

/** Dump formatted plans for key catalog queries (scale review tool). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q3_revenue_by_segment", "q_r4_merge_scd1",
        "q_x_minhash_lsh", "q_x_token_count")
    names.foreach { n =>
      println(s"========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
