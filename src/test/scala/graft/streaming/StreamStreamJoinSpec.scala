package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Stream-stream interval join, Spark-native: clicks enrich with the
  * impression that preceded them within a bounded window. Watermarks on
  * BOTH sides bound the join state (Spark drops buffered rows once the
  * other side's watermark passes the interval) — the same banded-time
  * idea as `AsOf.rangeJoin`, in its streaming form. The spec pins the
  * semantics against the equivalent batch interval join.
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked interval join matches the batch join") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[(String, Long)]   // (ad, impression ms)
    val clicks = MemoryStream[(String, Long)] // (ad, click ms)

    val impDf = imps.toDF().toDF("ad", "ims")
      .withColumn("its", timestamp_millis(col("ims")))
      .withWatermark("its", "10 seconds")
    val clickDf = clicks.toDF().toDF("ad", "cms")
      .withColumn("cts", timestamp_millis(col("cms")))
      .withWatermark("cts", "10 seconds")

    // click joins impressions at most 5s before it
    val q = impDf.join(
        clickDf.withColumnRenamed("ad", "c_ad"),
        col("ad") === col("c_ad") &&
          col("cts") >= col("its") &&
          col("cts") <= col("its") + expr("INTERVAL 5 SECONDS"))
      .select(col("ad"), col("ims"), col("cms"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssjoin").start()
    try {
      imps.addData(("a", 1000L), ("b", 2000L), ("a", 20000L))
      clicks.addData(("a", 3000L), ("b", 9000L), ("a", 21000L))
      q.processAllAvailable()
      // advance watermarks so all joinable pairs flush
      imps.addData(("z", 60000L)); clicks.addData(("z", 60000L))
      q.processAllAvailable()

      val got = spark.sql("SELECT ad, ims, cms FROM ssjoin")
        .as[(String, Long, Long)].collect().toSet

      val impB = Seq(("a", 1000L), ("b", 2000L), ("a", 20000L), ("z", 60000L))
        .toDF("ad", "ims")
      val clickB = Seq(("a", 3000L), ("b", 9000L), ("a", 21000L),
        ("z", 60000L)).toDF("c_ad", "cms")
      val expect = impB.join(clickB,
          col("ad") === col("c_ad") && col("cms") >= col("ims") &&
            col("cms") <= col("ims") + 5000L)
        .select(col("ad"), col("ims"), col("cms"))
        .as[(String, Long, Long)].collect().toSet
      assert(got == expect)
      // sanity: ("b",9000) is outside b's 5s window, ("a",3000) inside
      assert(got.contains(("a", 1000L, 3000L)))
      assert(!got.exists(r => r._1 == "b" && r._3 == 9000L))
    } finally q.stop()
  }
}
