package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamDedupSpec extends SparkSpec {

  test("duplicates within the watermark are dropped; state expires after it") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val out = StreamDedup.withinWatermark(
      mem.toDF().toDF("ts", "k"), "ts", "10 seconds", Seq("k"))
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sdedup").start()
    try {
      def t(s: Int) = java.sql.Timestamp.valueOf(
        f"2026-01-01 00:${s / 60}%02d:${s % 60}%02d")
      // batch 1: a + its immediate redelivery → one row survives
      mem.addData((t(1), "a"), (t(2), "a"), (t(3), "b"))
      q.processAllAvailable()
      // batch 2: another near-time redelivery of a → dropped (state alive)
      mem.addData((t(5), "a"))
      q.processAllAvailable()
      // batch 3: advance event time far past the delay → a's state expires
      mem.addData((t(300), "c"))
      q.processAllAvailable()
      // batch 4: a reappears long after the watermark window → re-admitted
      mem.addData((t(301), "a"))
      q.processAllAvailable()
      val ks = spark.sql("SELECT k FROM sdedup").as[String].collect().toSeq
      assert(ks.count(_ == "a") == 2) // first arrival + post-expiry arrival
      assert(ks.count(_ == "b") == 1 && ks.count(_ == "c") == 1)
    } finally q.stop()
  }

  test("bloomGatedBatch is set-identical to Dedup.incremental") {
    import spark.implicits._
    import graft.ops.Dedup
    val corpus = (1 to 300).map(i => s"k$i").toDF("k")
    // batch: corpus dups (100-300), new keys (301-450), within-batch dups
    val batch = ((100 to 450).map(i => (i.toLong, s"k$i")) ++
      Seq((900L, "k310"), (901L, "k449"))).toDF("id", "k")
    val viaBloom = StreamDedup.bloomGatedBatch(batch, corpus, Seq("k"), "id")
      .select("id").as[Long].collect().toSet
    val viaExact = Dedup.incremental(batch, corpus, Seq("k"), "id")
      .select("id").as[Long].collect().toSet
    assert(viaBloom == viaExact)
    // sanity on the semantics themselves: corpus keys gone, min id kept
    assert(!viaBloom.contains(100L) && viaBloom.contains(310L))
    assert(viaBloom.contains(449L) && !viaBloom.contains(901L))
  }
}
