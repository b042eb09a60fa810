package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.functions.{HllAggExprs, Portable, Sketches}

/** The custom HLL TypedImperativeAggregate inside a watermarked
  * streaming window aggregation: per-(key, hour) distinct estimates
  * maintained in streaming state (the buffer serializes through the
  * state store), equal to the batch sketch over the same events. This
  * is the "distinct users per hour per domain" shape at stream time —
  * register arrays as state instead of exact key sets, so state size is
  * windows × groups × m ints regardless of cardinality. */
class WindowedHllSpec extends SparkSpec {
  import spark.implicits._

  test("windowed streaming sketches equal batch; state is register-sized") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val P = 6
    val events = (1 to 3000).map { i =>
      val hour = i % 3 // three 1-hour windows
      ("d" + (i % 2), hour * 3600000L + (i % 600) * 1000L, "u" + (i % 500))
    }

    val mem = MemoryStream[(String, Long, String)]
    val out = mem.toDF().toDF("domain", "ms", "user")
      .withColumn("ts", timestamp_millis(col("ms")))
      // allowance spans the whole replay: the fixture feeds all three
      // hours interleaved, so a tight watermark would (correctly) drop
      // later batches' window-0 events as late — this test pins the
      // aggregate-in-state machinery, not late-data policy
      .withWatermark("ts", "10 hours")
      .groupBy(col("domain"), window(col("ts"), "1 hour"))
      .agg(HllAggExprs.hllFromHashes(Portable.h60(col("user")), P).as("hll"))
      .select(col("domain"), col("window.start").as("ws"), col("hll"))
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("whll").start()
    try {
      events.grouped(1000).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      // register-max over ALL emissions per (domain, window) == batch
      // sketch (idempotent+monotone merge — at-least-once replay shape;
      // the memory sink's row order is not emission order, so "latest
      // row wins" is NOT a valid way to read update-mode output)
      val got = Sketches.hllMergeAgg(
          spark.sql("SELECT domain, ws, hll FROM whll"),
          Seq("domain", "ws"), P)
        .as[(String, java.sql.Timestamp, Seq[Int])].collect()
        .map(r => (r._1, r._2.getTime) -> r._3).toMap

      val batch = events.toDF("domain", "ms", "user")
        .withColumn("ws", (col("ms") - col("ms") % 3600000L))
      val expect = Sketches.hllSketch(batch, Seq("domain", "ws"),
          col("user"), P)
        .as[(String, Long, Seq[Int])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got.keySet == expect.keySet) // 2 domains × 3 windows
      assert(got == expect)
      assert(got.values.forall(_.size == (1 << P)))
    } finally q.stop()
  }
}
