package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ops.Behavior

/** Streaming funnel == batch funnel over the same in-order event log. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("signup", "view", "click", "purchase")

  test("stream-final stage counts equal the batch funnel") {
    val rnd = new Random(42)
    val types = stages ++ Seq("noise", "error")
    val events = (1 to 2000).map { _ =>
      (s"u${rnd.nextInt(80)}", types(rnd.nextInt(types.size)),
        rnd.nextInt(100000).toLong)
    }.sortBy(_._3) // in-order arrival: the twin's exactness contract

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, Long)]
    val q = FunnelStream.funnelByUser(mem.toDS(), stages)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnelstream").start()
    try {
      events.grouped(700).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      // latest update per user = final progress
      val finalReached = spark.sql(
        """SELECT key, max(stagesReached) AS r
          |FROM funnelstream GROUP BY key""".stripMargin)
        .as[(String, Int)].collect().toMap

      val batch = Behavior.funnel(
        events.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", stages).head()
      val batchCounts = stages.indices.map(i => batch.getLong(i))
      val streamCounts = stages.indices.map(i =>
        finalReached.values.count(_ >= i + 1).toLong)
      assert(streamCounts == batchCounts,
        s"stream=$streamCounts batch=$batchCounts")
    } finally q.stop()
  }

  test("updates are monotone and only emitted on progress") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, Long)]
    val q = FunnelStream.funnelByUser(mem.toDS(), stages)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnelmono").start()
    try {
      mem.addData(("u1", "signup", 10L)); q.processAllAvailable()
      mem.addData(("u1", "signup", 12L)); q.processAllAvailable() // no progress
      mem.addData(("u1", "view", 20L), ("u1", "click", 25L))
      q.processAllAvailable()
      mem.addData(("u1", "purchase", 5L)) // before click: not valid
      q.processAllAvailable()
      val ups = spark.sql(
        "SELECT stagesReached, lastStageTime FROM funnelmono")
        .as[(Int, Long)].collect().toSeq.sorted
      assert(ups == Seq((1, 10L), (3, 25L)))
    } finally q.stop()
  }
}
