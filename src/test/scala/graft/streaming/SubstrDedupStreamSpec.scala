package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming exact-substring dedup: batch-order equivalence with the
  * keepFirst batch operator, exactly-once replay, lineage restart, and
  * a live MemoryStream e2e. */
class SubstrDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def dump(df: DataFrame): Map[Long, (String, Long, Long)] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("streamed batches == batch stripDuplicateSpans(keepFirst) over the concatenation") {
    val dir = Files.createTempDirectory("substream").toString + "/keys"
    val s = new SubstrDedupStream(spark, dir, "doc_id", "text", n = 3)
    // ids increase across batches → batch-order-wins equals the global
    // (doc, start) first-occurrence rule of the batch operator
    val b1 = Seq((1L, "the cat sat on the mat today"),
      (2L, "fresh words appear here only now"))
    val b2 = Seq((3L, "yesterday the cat sat on a rug"),
      (4L, "fresh words appear here too friend"))
    val got1 = dump(s.processBatch(b1.toDF("doc_id", "text"), 0L))
    val got2 = dump(s.processBatch(b2.toDF("doc_id", "text"), 1L))
    graft.core.Metrics.drainUnpersist()
    val batch = dump(Dedup.stripDuplicateSpans(
      (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text", n = 3,
      keepFirst = true))
    assert(got1 ++ got2 == batch, s"stream=${got1 ++ got2}\nbatch=$batch")
    // doc 3 loses 'the cat sat on' (doc 1 wrote it first);
    // doc 4 loses 'fresh words appear here' (doc 2 first)
    assert(got2(3L) == (("yesterday a rug", 3L, 4L)))
    assert(got2(4L) == (("too friend", 2L, 4L)))
    val (batches, kept, dropped) = s.stats
    assert(batches == 2 && kept + dropped == 26) // 7+6+7+6 input tokens
  }

  test("duplicate store keys (replay debris / cross-lineage) change nothing") {
    // the r16 probe dedups the MATCHED set, not the store — a store
    // holding the same key under several lineages (or replay-appended
    // copies awaiting compaction) must mark exactly like a clean one
    val base = Seq((1L, "the cat sat on the mat today"),
      (2L, "fresh words appear here only now"))
    val probe = Seq((7L, "yesterday the cat sat on a rug"),
      (8L, "fresh words appear here too friend"))
    def run(dupCopies: Int): Map[Long, (String, Long, Long)] = {
      val dir = Files.createTempDirectory(s"substream_dup$dupCopies")
        .toString + "/keys"
      (0 until dupCopies).foreach { i =>
        val w = new SubstrDedupStream(spark, dir, "doc_id", "text",
          n = 3, lineage = s"writer$i")
        w.processBatch(base.toDF("doc_id", "text"), 0L)
        graft.core.Metrics.drainUnpersist()
      }
      val s = new SubstrDedupStream(spark, dir, "doc_id", "text",
        n = 3, lineage = "reader")
      val got = dump(s.processBatch(probe.toDF("doc_id", "text"), 0L))
      graft.core.Metrics.drainUnpersist()
      got
    }
    assert(run(3) == run(1))
  }

  test("replaying a batch id reproduces identical output despite appended keys") {
    val dir = Files.createTempDirectory("substream2").toString + "/keys"
    val s = new SubstrDedupStream(spark, dir, "doc_id", "text", n = 3)
    dump(s.processBatch(
      Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"), 0L))
    val b = Seq((2L, "zz alpha beta gamma yy"),
      (3L, "one two three four")).toDF("doc_id", "text")
    val first = dump(s.processBatch(b, 1L))
    val replay = dump(s.processBatch(b, 1L))
    graft.core.Metrics.drainUnpersist()
    assert(first == replay)
    assert(replay(2L) == (("zz yy", 2L, 3L))) // 'alpha beta gamma' cut
    assert(replay(3L) == (("one two three four", 4L, 0L)))
    // compaction folds the replay-duplicated keys, decisions unchanged
    s.compact()
    val keys = spark.read.parquet(dir)
    assert(keys.count() == keys.select("key").distinct().count())
    val after = dump(s.processBatch(
      Seq((4L, "qq one two three pp")).toDF("doc_id", "text"), 2L))
    graft.core.Metrics.drainUnpersist()
    assert(after(4L) == (("qq pp", 2L, 3L)))
  }

  test("fresh-checkpoint restart (new lineage, ids back at 0) keeps the corpus") {
    val dir = Files.createTempDirectory("substream3").toString + "/keys"
    val a = new SubstrDedupStream(spark, dir, "doc_id", "text", 3, "run-a")
    dump(a.processBatch(
      Seq((1L, "shared boiler plate words")).toDF("doc_id", "text"), 0L))
    val b = new SubstrDedupStream(spark, dir, "doc_id", "text", 3, "run-b")
    val got = dump(b.processBatch(
      Seq((2L, "xx shared boiler plate yy")).toDF("doc_id", "text"), 0L))
    graft.core.Metrics.drainUnpersist()
    assert(got(2L) == (("xx yy", 2L, 3L)),
      "run-a's corpus must survive the lineage restart")
  }

  test("cadenced compaction folds the store mid-stream, decisions unchanged") {
    val dir = Files.createTempDirectory("substream5").toString + "/keys"
    val s = new SubstrDedupStream(spark, dir, "doc_id", "text", n = 3,
      compactEvery = 2)
    dump(s.processBatch(
      Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"), 0L))
    // batch 1 trips the cadence: the store folds right after the append
    dump(s.processBatch(
      Seq((2L, "epsilon zeta eta theta")).toDF("doc_id", "text"), 1L))
    graft.core.Metrics.drainUnpersist()
    val keys = spark.read.parquet(dir)
    assert(keys.count() == keys.select("key").distinct().count())
    // the folded store still screens batch-0 content
    val got = dump(s.processBatch(
      Seq((3L, "xx alpha beta gamma yy")).toDF("doc_id", "text"), 2L))
    graft.core.Metrics.drainUnpersist()
    assert(got(3L) == (("xx yy", 2L, 3L)))
  }

  test("live MemoryStream e2e through foreachBatch") {
    val dir = Files.createTempDirectory("substream4").toString
    val s = new SubstrDedupStream(spark, dir + "/keys", "doc_id", "text", 3)
    val outDir = dir + "/out"
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", dir + "/ck")
      .foreachBatch { (b: DataFrame, id: Long) =>
        s.processBatch(b, id).write
          .mode(org.apache.spark.sql.SaveMode.Append).parquet(outDir)
        graft.core.Metrics.drainUnpersist()
      }
      .start()
    try {
      mem.addData((10L, "the quick brown fox jumps"))
      q.processAllAvailable()
      mem.addData((11L, "aa the quick brown fox bb"))
      q.processAllAvailable()
    } finally q.stop()
    val out = dump(spark.read.parquet(outDir))
    assert(out(10L) == (("the quick brown fox jumps", 5L, 0L)))
    assert(out(11L) == (("aa bb", 2L, 4L)))
  }
}
