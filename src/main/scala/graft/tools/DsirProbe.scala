package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DSIR enrichment probe: select vs resample against two targets —
  * the catalog's uniform-subset stand-in (doc_id % 50, distributionally
  * IDENTICAL to the corpus → importance weights are near-flat) and a
  * single-source target (distributionally distinct → real weights).
  * The pair shows resampling behaving exactly as the paper predicts:
  * ≈uniform when weights are flat, enriched when they are not. */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.read(spark, sfDir, "documents")
      .select("doc_id", "text", "source")
    val srcs = docs.select("source").distinct()
      .orderBy("source").limit(1).collect().map(_.getString(0))
    val oneSrc = srcs.head
    val targets = Seq(
      "uniform-subset" -> docs.filter(col("doc_id") % 50 === 0),
      s"single-source($oneSrc)" -> docs.filter(col("source") === oneSrc))
    for ((tag, t) <- targets) {
      val inTarget = t.select(col("doc_id").as("__tid"))
      def hits(sel: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val s = sel.select("doc_id")
        (s.join(inTarget, col("doc_id") === col("__tid"), "left_semi")
          .count(), s.count())
      }
      val selTop = graft.ops.Dsir.select(
        docs, "doc_id", "text", t, "text", k = 50)
      val selRes = graft.ops.Dsir.resample(
        docs, "doc_id", "text", t, "text", k = 50)
      val (hTop, nTop) = hits(selTop)
      val (hRes, nRes) = hits(selRes)
      val base = t.count().toDouble / docs.count()
      println(f"DSIRPROBE target=$tag base=${base * 100}%.1f%% " +
        f"select=$hTop/$nTop resample=$hRes/$nRes")
    }
    spark.stop()
  }
}
