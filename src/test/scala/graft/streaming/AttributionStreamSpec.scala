package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ops.AsOf

/** Streaming last-touch == batch as-of attribution over the same
  * in-order event log. */
class AttributionStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream attributions equal the batch as-of join") {
    val rnd = new Random(7)
    val events = (1 to 3000).map { i =>
      val typ = rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => "click"
        case 4 | 5         => "purchase"
        case _             => "noise"
      }
      (s"u${rnd.nextInt(60)}", typ, rnd.nextInt(50000).toLong, i.toLong)
    }.sortBy(e => (e._3, e._4)) // in-order arrival

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val q = AttributionStream.lastTouch(mem.toDS(), "click", "purchase")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attrib").start()
    try {
      // batch boundaries must not split an equal-timestamp group (the
      // twin's tie contract is same-batch); extend each chunk to the
      // end of its last timestamp's run
      val boundarySafe = {
        val chunks = Seq.newBuilder[Seq[(String, String, Long, Long)]]
        var rest = events
        while (rest.nonEmpty) {
          val take = rest.take(800)
          val lastT = take.last._3
          val (tie, remaining) = rest.drop(800).span(_._3 == lastT)
          chunks += (take ++ tie)
          rest = remaining
        }
        chunks.result()
      }
      boundarySafe.foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      val got = spark.sql(
        "SELECT conversionId, touchId, lagMicros FROM attrib")
        .as[(Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap

      val ev = events.toDF("user_id", "event_type", "t", "event_id")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"t".as("v"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"t".as("ct"), $"event_id".as("click_id"))
      val batch = AsOf.asofJoin(purchases, clicks, "user_id", "v", "ct",
          payload = Seq("click_id", "ct"), tieBreak = "click_id")
        .select($"event_id",
          $"click_id".cast("long"), ($"v" - $"ct").cast("long"))
        .as[(Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap

      assert(got.size == batch.size)
      assert(got == batch)
      // sanity: both attributed and unattributed conversions occurred
      assert(got.values.exists(_._1.isDefined))
      assert(got.values.exists(_._1.isEmpty))
    } finally q.stop()
  }
}
