package graft.tools

import org.apache.spark.sql.SparkSession

/** Executes one catalog query and prints the FINAL adaptive plan (after
  * AQE replanning), so runtime stage reuse / ReusedQueryStage nodes are
  * visible — the initial-plan explain hides them. */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // collect() executes THIS dataset's own QueryExecution (a write would
    // wrap the plan in a fresh command QE and leave this one unexecuted)
    val n = df.collect().length
    println(s"rows=$n")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
