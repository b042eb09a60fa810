package graft.streaming

import graft.SparkSpec
import graft.sources.StaticSchemaFetcher
import graft.warehouse.ParquetCatalog
import org.apache.spark.sql.functions._

/** The bench load generator must produce envelopes the REAL pipeline
  * decodes: these specs drive its output through processBatch end to end
  * (decode → transform → merge), including the v1→v2 add-column
  * migration the streaming bench exercises mid-run — so drift in the
  * generator breaks a spec, not silently the recorded
  * `stream_events_per_sec`. */
class CdcLoadGenSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-loadgen").toString

  private val fetcher = new StaticSchemaFetcher(
    Map(1 -> CdcLoadGen.schemaV1, 2 -> CdcLoadGen.schemaV2))

  private def cfg = CdcStream.TopicConfig(
    topic = "bench.stream.users",
    targetSchema = "bench",
    targetTable = "users",
    maskEnabled = false)

  test("generated batch 0 is all creates and lands as rows") {
    val cat = new ParquetCatalog(spark, tmp())
    val b0 = CdcLoadGen.batch(0, 100, schemaId = 1)
    assert(b0.map(_._1) == (0L until 100L)) // monotone offsets
    val jobs = CdcStream.processBatch(
      b0.toDF("offset", "value"), fetcher, cat, cfg)
    assert(jobs.size == 1)
    assert(jobs.head.createEvents == 100 &&
      jobs.head.updateEvents == 0 && jobs.head.deleteEvents == 0)
    val t = cat.load("bench", "users")
    assert(t.count() == 100)
    // generated values survive decode+transform
    assert(t.filter(col("id") === "7").select("name").as[String].head()
      == "user_7")
  }

  test("later batches carry the documented C/U/D mix and merge correctly") {
    val cat = new ParquetCatalog(spark, tmp())
    CdcStream.processBatch(
      CdcLoadGen.batch(0, 100, 1).toDF("offset", "value"), fetcher, cat, cfg)
    val jobs = CdcStream.processBatch(
      CdcLoadGen.batch(1, 100, 1).toDF("offset", "value"), fetcher, cat, cfg)
    // per the generator contract: 80% creates, 15% updates, 5% deletes
    assert(jobs.head.createEvents == 80 &&
      jobs.head.updateEvents == 15 && jobs.head.deleteEvents == 5)
    val t = cat.load("bench", "users")
    // 100 from batch 0, +80 fresh creates, 15 updates of batch-0 ids
    // merge IN PLACE (no new rows), -5 deletes of batch-0 ids
    assert(t.count() == 100 + 80 - 5)
    // and an updated row really took the update path
    assert(t.filter(col("id") === "16").count() == 1)
  }

  test("schema v2 batch migrates the table (extra column) mid-stream") {
    val cat = new ParquetCatalog(spark, tmp())
    CdcStream.processBatch(
      CdcLoadGen.batch(0, 50, 1).toDF("offset", "value"), fetcher, cat, cfg)
    assert(!cat.load("bench", "users").columns.contains("extra"))
    CdcStream.processBatch(
      CdcLoadGen.batch(1, 50, 2).toDF("offset", "value"), fetcher, cat, cfg)
    val t = cat.load("bench", "users")
    assert(t.columns.contains("extra"),
      "v2 add-column migration must reach the table")
    // v2 creates carry the extra value; surviving v1 rows are null there
    assert(t.filter(col("id") === "90").select("extra").as[String].head()
      == "x90")
    assert(t.filter(col("id") === "0" && col("extra").isNull).count() == 1)
  }
}
