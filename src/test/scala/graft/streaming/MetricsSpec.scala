package graft.streaming

import graft.SparkSpec
import graft.core.Metrics
import graft.sources.StaticSchemaFetcher
import graft.warehouse.ParquetCatalog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The reference's Prometheus surface re-expressed
  * (REDSHIFTSINK.md:115–181): per-phase merge histograms, byte/message
  * counters, running gauge — populated by a real streamed merge. */
class MetricsSpec extends SparkSpec {
  import spark.implicits._
  import CdcFixture._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-metrics").toString

  private val fetcher = new StaticSchemaFetcher(Map(1 -> envelopeSchemaJson))

  private def cfg = CdcStream.TopicConfig(
    topic = "ts.inventory.users",
    targetSchema = "inventory",
    targetTable = "users",
    maskEnabled = false)

  private def toDf(rows: Seq[(Long, (Option[User], Option[User]))]) =
    rows.map { case (off, (b, a)) => (off, frame(1, b, a)) }
      .toDF("offset", "value")

  test("merge batches populate phase timings and throughput counters") {
    Metrics.reset()
    Metrics.enablePhaseBreakdown(true)
    try {
      val cat = new ParquetCatalog(spark, tmp())
      CdcStream.processBatch(
        toDf(Seq(10L -> create(1, "ada", 6807), 11L -> create(2, "bob", 0))),
        fetcher, cat, cfg)
      // updates force the full merge path → all loader phases observed
      CdcStream.processBatch(
        toDf(Seq(12L -> update(1, "ada", "ada2"), 13L -> delete(2, "bob"))),
        fetcher, cat, cfg)

      val tag = "inventory.users"
      val phases = Seq("copystage", "dedupe", "deletecommon", "deleteop",
        "copytarget")
      for (p <- phases) {
        val s = Metrics.get(tag, s"loader_${p}_seconds")
        assert(s.exists(st => st.count >= 1 && st.sum > 0.0),
          s"phase $p not observed: $s")
      }
      // totals: one loader_seconds observation per batch
      assert(Metrics.get(tag, "loader_seconds").exists(_.count == 2))
      // throughput: 4 events loaded, frames have bytes
      assert(Metrics.get(tag, "loader_messages_loaded")
        .exists(_.sum == 4.0))
      assert(Metrics.get(tag, "batcher_bytes_processed")
        .exists(_.sum > 0.0))
      assert(Metrics.get(tag, "batcher_messages_processed")
        .exists(_.sum == 4.0))
    } finally {
      Metrics.enablePhaseBreakdown(false)
      Metrics.reset()
    }
  }

  test("phase breakdown off: fused merge, totals still observed") {
    Metrics.reset()
    val cat = new ParquetCatalog(spark, tmp())
    CdcStream.processBatch(
      toDf(Seq(10L -> create(1, "ada", 6807))), fetcher, cat, cfg)
    CdcStream.processBatch(
      toDf(Seq(11L -> update(1, "ada", "eva"))), fetcher, cat, cfg)
    val tag = "inventory.users"
    // no per-phase materialization...
    assert(Metrics.get(tag, "loader_dedupe_seconds").isEmpty)
    // ...but the fused totals land
    assert(Metrics.get(tag, "loader_copytarget_seconds").exists(_.count == 2))
    assert(Metrics.get(tag, "loader_seconds").exists(_.count == 2))
    Metrics.reset()
  }

  test("listener: running gauge and trigger seconds from the engine") {
    Metrics.reset()
    val listener = new MetricsListener()
    spark.streams.addListener(listener)
    val cat = new ParquetCatalog(spark, tmp())
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    val source = mem.toDF().toDF("offset", "value")
    val q = CdcStream.start(source, fetcher, cat, cfg,
      checkpointDir = tmp(), maxWaitSeconds = 1)
    val tag = "graft-cdc-inventory-users"
    try {
      mem.addData((10L, frame(1, None, Some(User(1, Some("ada"), None)))))
      q.processAllAvailable()
      assert(Metrics.get(tag, "loader_running").exists(_.max == 1.0))
    } finally q.stop()
    // termination event is async — wait for the gauge to drop before
    // removing the listener
    val deadline = System.nanoTime() + 10e9.toLong
    while (System.nanoTime() < deadline &&
      !Metrics.get(tag, "loader_running").exists(_.sum == 0.0))
      Thread.sleep(50)
    spark.streams.removeListener(listener)
    assert(Metrics.get(tag, "loader_running").exists(_.sum == 0.0))
    assert(Metrics.get(tag, "trigger_seconds").exists(_.count >= 1))
    assert(Metrics.get(tag, "input_rows").exists(_.sum >= 1.0))
    Metrics.reset()
  }
}
