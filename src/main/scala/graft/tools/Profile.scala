package graft.tools
import graft.ops._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for operator stages (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(fn: => Unit): Unit = {
      val t0 = System.nanoTime(); fn
      println(f"PROFILE $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("shingles+explode") {
      docs.select(explode(Dedup.shingles(col("text"), 3))).write.format("noop").mode("overwrite").save()
    }
    time("minHashSignatures") {
      Dedup.minHashSignatures(docs, "doc_id", "text", 3, 64).write.format("noop").mode("overwrite").save()
    }
    time("minHashCandidates_full") {
      Dedup.minHashCandidates(docs, "doc_id", "text", 3, 64, 16, 0.3).write.format("noop").mode("overwrite").save()
    }
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 64).cache()
    sigs.count()
    time("candidates_from_cached_sigs") {
      val keyed = sigs.select(col("id"), col("sig"),
        explode(Dedup.lshBandKeys(col("sig"), 16, 64)).as("bk"))
      keyed.as("a").join(keyed.as("b"),
          col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          graft.functions.VectorExprs.equalPositions(col("a.sig"), col("b.sig")).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
