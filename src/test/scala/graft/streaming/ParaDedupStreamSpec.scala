package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming paragraph dedup: batch-order replay equivalence with the
  * batch operator, exactly-once replay by construction, live
  * MemoryStream e2e, and compaction that changes no decision. */
class ParaDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sep = "\n\n"

  private def dump(df: DataFrame): Map[Long, (String, Long, Long)] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("streamed batches == batch dedupParagraphs over the concatenation") {
    val dir = Files.createTempDirectory("parastream").toString + "/keys"
    val s = new ParaDedupStream(spark, dir, "doc_id", "text", sep)
    // ids increase across batches, so batch-order-wins == global min
    // (doc, pos) — the exact batch-operator rule
    val b1 = Seq((1L, s"alpha${sep}footer"), (2L, s"beta${sep}footer"))
    val b2 = Seq((3L, s"alpha${sep}gamma"), (4L, s"footer${sep}gamma"))
    val got1 = dump(s.processBatch(b1.toDF("doc_id", "text"), 0L))
    val got2 = dump(s.processBatch(b2.toDF("doc_id", "text"), 1L))

    val batch = dump(Dedup.dedupParagraphs(
      (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text", sep))
    assert(got1 ++ got2 == batch)
    assert(got2(3L) == ((s"gamma", 1L, 1L))) // alpha seen in batch 0
    assert(got2(4L) == (("", 0L, 2L)))
    val (batches, kept, dropped) = s.stats
    assert(batches == 2 && kept == 4 && dropped == 4)
  }

  test("replaying a batch id reproduces identical output despite appended keys") {
    val dir = Files.createTempDirectory("parastream2").toString + "/keys"
    val s = new ParaDedupStream(spark, dir, "doc_id", "text", sep)
    dump(s.processBatch(
      Seq((1L, s"one${sep}shared")).toDF("doc_id", "text"), 0L))
    val b = Seq((2L, s"two${sep}shared"), (3L, s"two${sep}three"))
      .toDF("doc_id", "text")
    val first = dump(s.processBatch(b, 1L))
    // at-least-once replay of batch 1: its own keys (batch_id = 1) must
    // NOT count as corpus — output identical, not fully-deduped docs
    val replay = dump(s.processBatch(b, 1L))
    assert(first == replay)
    assert(replay(2L) == ((s"two", 1L, 1L)))
    assert(replay(3L) == ((s"three", 1L, 1L)))
    // compaction folds the duplicate keys and changes no later decision
    s.compact()
    val keys = spark.read.parquet(dir)
    assert(keys.count() == keys.select("key").distinct().count())
    val after = dump(s.processBatch(
      Seq((4L, s"three${sep}four")).toDF("doc_id", "text"), 2L))
    assert(after(4L) == ((s"four", 1L, 1L)))
  }

  test("compact crash mid-swap: the stranded store recovers, corpus not forgotten") {
    val base = Files.createTempDirectory("parastream5").toString
    val dir = base + "/keys"
    val s = new ParaDedupStream(spark, dir, "doc_id", "text", sep)
    dump(s.processBatch(
      Seq((1L, s"one${sep}boiler")).toDF("doc_id", "text"), 0L))
    // simulate a compact() that crashed between the two swap renames:
    // the live store is stranded aside as __old, the target is gone
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__old")))
    // next trigger must finish the swap and still know 'boiler'
    val got = dump(s.processBatch(
      Seq((2L, s"two${sep}boiler")).toDF("doc_id", "text"), 1L))
    assert(got(2L) == ((s"two", 1L, 1L)),
      "a stranded store must not forget the screened corpus")
  }

  test("fresh-checkpoint restart (new lineage, ids back at 0) keeps the corpus") {
    val dir = Files.createTempDirectory("parastream4").toString + "/keys"
    val a = new ParaDedupStream(spark, dir, "doc_id", "text", sep, "run-a")
    dump(a.processBatch(
      Seq((1L, s"alpha${sep}boiler")).toDF("doc_id", "text"), 0L))
    // new query lineage, batch ids restart at 0: lineage-a's keys MUST
    // still count (same-lineage-only filtering would admit 'boiler')
    val b = new ParaDedupStream(spark, dir, "doc_id", "text", sep, "run-b")
    val got = dump(b.processBatch(
      Seq((2L, s"beta${sep}boiler")).toDF("doc_id", "text"), 0L))
    assert(got(2L) == ((s"beta", 1L, 1L)))
    // and run-b's own replay semantics still hold
    val replay = dump(b.processBatch(
      Seq((2L, s"beta${sep}boiler")).toDF("doc_id", "text"), 0L))
    assert(replay == got)
  }

  test("live MemoryStream e2e through foreachBatch") {
    val dir = Files.createTempDirectory("parastream3").toString
    val s = new ParaDedupStream(spark, dir + "/keys", "doc_id", "text", sep)
    val outDir = dir + "/out"
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", dir + "/ck")
      .foreachBatch { (b: DataFrame, id: Long) =>
        s.processBatch(b, id).write
          .mode(org.apache.spark.sql.SaveMode.Append).parquet(outDir)
      }
      .start()
    try {
      mem.addData((10L, s"x${sep}boiler"), (11L, s"y${sep}boiler"))
      q.processAllAvailable()
      mem.addData((12L, s"x${sep}z"))
      q.processAllAvailable()
    } finally q.stop()
    val out = dump(spark.read.parquet(outDir))
    assert(out(10L) == ((s"x${sep}boiler", 2L, 0L)))
    assert(out(11L) == ((s"y", 1L, 1L)))
    assert(out(12L) == ((s"z", 1L, 1L)))
  }
}
