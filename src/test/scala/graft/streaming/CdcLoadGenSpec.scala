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
    // an updated row (batch-1 position 16 targets id 16-4=12) stays
    // single, and a deleted one (position 19 -> id 15) is gone
    assert(t.filter(col("id") === "12").count() == 1)
    assert(t.filter(col("id") === "15").count() == 0)

    // batch 2: its update/delete targets must be ids batch 1 CREATED
    // (positions 16-19 of batch 1 were updates/deletes, not creates —
    // a naive prevBase+i target would hit phantom ids and the workload
    // would silently degrade to append-only from batch 2 on)
    val jobs2 = CdcStream.processBatch(
      CdcLoadGen.batch(2, 100, 1).toDF("offset", "value"), fetcher, cat, cfg)
    assert(jobs2.head.createEvents == 80 &&
      jobs2.head.updateEvents == 15 && jobs2.head.deleteEvents == 5)
    val t2 = cat.load("bench", "users")
    // updates hit existing batch-1 rows in place; deletes remove real rows
    assert(t2.count() == 175 + 80 - 5)
    // a batch-2 update target: id 100 + (16-4) = 112, created by batch 1,
    // must still exist exactly once (updated, not duplicated)
    assert(t2.filter(col("id") === "112").count() == 1)
    // a batch-2 delete target: id 100 + (19-4) = 115 must be gone
    assert(t2.filter(col("id") === "115").count() == 0)
  }

  test("zipfBatch is deterministic, skewed, and batch-width independent") {
    val a = CdcLoadGen.zipfBatch(3, 1000, universe = 5000)
    val b = CdcLoadGen.zipfBatch(3, 1000, universe = 5000)
    assert(a.map(_._1) == b.map(_._1))
    assert(a.zip(b).forall { case ((_, x), (_, y)) => x.sameElements(y) })
    // width independence: the same global ordinals yield the same bytes
    // whether the stream was sliced 1x1000 or 2x500
    val halves = CdcLoadGen.zipfBatch(6, 500, 5000) ++
      CdcLoadGen.zipfBatch(7, 500, 5000)
    assert(a.map(_._1) == halves.map(_._1))
    // hot-key skew: id 0 is the zipf head and must dominate; with
    // s=1.2, universe=5000 its share is ~9% vs 0.02% under uniform
    val cat = new ParquetCatalog(spark, tmp())
    CdcStream.processBatch(a.toDF("offset", "value"), fetcher, cat, cfg)
    val decoded = CdcStream.decodeGroup(
      a.toDF("offset", "value").withColumn("offset", col("offset")),
      CdcLoadGen.schemaV1, cfg)._1
    val top = decoded.groupBy("id").count()
      .orderBy(col("count").desc).limit(1).collect().head
    assert(top.getString(0) == "0", "zipf head must be id 0")
    assert(top.getLong(1) > 50, s"id 0 got only ${top.getLong(1)}/1000 events")
  }

  test("zipfBatch events decode and merge (C/U/D mix over a hot universe)") {
    val cat = new ParquetCatalog(spark, tmp())
    val jobs = CdcStream.processBatch(
      CdcLoadGen.zipfBatch(0, 1000, 2000).toDF("offset", "value"),
      fetcher, cat, cfg)
    assert(jobs.head.createEvents == 800 &&
      jobs.head.updateEvents == 150 && jobs.head.deleteEvents == 50)
    val t = cat.load("bench", "users")
    // dedupe collapses repeated hot ids to one row each; the table holds
    // exactly the distinct surviving ids (present, last op not delete)
    assert(t.count() == t.select("id").distinct().count())
    assert(t.count() > 0 && t.count() < 1000)
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
