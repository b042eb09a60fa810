package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange

/** Why doesn't the minhash band self-join reuse its shuffle? Builds the
  * keyed signature frame, self-joins it, and compares the canonicalized
  * forms of the two Exchange subtrees — printing the first structural
  * divergence if they differ. */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.read(spark, sfDir, "documents")
    val sigs = graft.ops.Dedup.minHashSignaturesPortable(
      docs, "doc_id", "text", 3, 64)
    val bands = 16; val rows = 4
    val bandKeys = array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        array_join(slice(col("sig"), b * rows + 1, rows), ",")
          .as("bucket"))): _*)
    val keyed = sigs.select(col("id"), col("sig"),
      explode(bandKeys).as("bk"))
    val joined = keyed.as("a").hint("merge").join(
      keyed.as("b").hint("merge"),
      col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
    val plan = joined.queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    println(s"AQE-off: nExchanges=${exchanges.length} " +
      s"reused=${plan.toString.contains("ReusedExchange")}")

    // now the AQE path: same query, adaptive on, executed to finality
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val joined2 = keyed.as("a").hint("merge").join(
      keyed.as("b").hint("merge"),
      col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
    joined2.collect()
    val fin = joined2.queryExecution.executedPlan.toString
    println(s"AQE-on: reusedExchanges=${
      fin.linesIterator.count(_.contains("ReusedExchange"))} " +
      s"shuffleStages=${
        fin.linesIterator.count(_.contains("ShuffleQueryStage"))} " +
      s"fileScans=${fin.linesIterator.count(_.contains("FileScan"))}")
    spark.stop()
  }
}
