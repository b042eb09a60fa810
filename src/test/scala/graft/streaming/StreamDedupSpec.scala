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

  test("sketch update/merge: advanced sketch keeps no-false-negatives") {
    import spark.implicits._
    import graft.ops.Dedup
    import graft.functions.Bloom
    import org.apache.spark.sql.functions.{col, xxhash64}
    val corpus = (1 to 200).map(i => s"k$i").toDF("k")
    val sketch0 = Dedup.bloomSketch(corpus, Seq("k"))
    // batch 1 survivors advance the sketch OUT OF BAND (no corpus re-agg)
    val survivors = (201 to 260).map(i => s"k$i").toDF("k")
    val survivorHashes = survivors.select(xxhash64(col("k")))
      .as[Long].collect()
    val sketch1 = Bloom.update(sketch0, survivorHashes)
    // every old AND new key now probes maybe_seen=true — a true duplicate
    // can never take the definitely-new fast path
    val probeAll = corpus.union(survivors)
    val flagged = Dedup.bloomGateWith(probeAll, sketch1, Seq("k"))
      .filter(col("maybe_seen")).count()
    assert(flagged == 260L)
    // merge of two independently-built same-family sketches == union
    val sketchB = Dedup.bloomSketch(survivors, Seq("k"))
    val merged = Bloom.merge(sketch0, sketchB)
    val flaggedM = Dedup.bloomGateWith(probeAll, merged, Seq("k"))
      .filter(col("maybe_seen")).count()
    assert(flaggedM == 260L)
    // and the untouched original still misses the new keys (sane FPR)
    val missed = Dedup.bloomGateWith(survivors, sketch0, Seq("k"))
      .filter(!col("maybe_seen")).count()
    assert(missed > 0L)
  }
}
