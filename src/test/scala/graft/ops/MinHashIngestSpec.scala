package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** End-to-end streaming near-dup ingest — the text-side twin of
  * `AnnIngestSpec`: a MemoryStream of documents drives
  * [[Dedup.minHashIncrementalPortable]] per micro-batch against the
  * persisted signature store, then appends the batch's signatures to
  * advance the corpus (the documented ingest contract: the corpus text
  * is never re-shingled). Invariant: the union of per-batch candidate
  * sets equals batch-mode [[Dedup.minHashCandidatesPortable]] over the
  * full corpus, restricted to pairs whose LATER-ARRIVING side is a
  * streamed doc (within-corpus pairs precede the stream by
  * construction). */
class MinHashIngestSpec extends SparkSpec {
  import spark.implicits._

  // word-soup docs with deliberate near-dups across batches
  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon eta"),
    (3L, "one two three four five six seven"),
    (4L, "red orange yellow green blue violet"))
  private val batch1 = Seq(
    (10L, "alpha beta gamma delta epsilon zeta"), // dup of 1 (and near 2)
    (11L, "totally novel words appear here now"))
  private val batch2 = Seq(
    (20L, "one two three four five six seven"), // dup of 3
    (21L, "totally novel words appear here too")) // near 11

  test("streamed ingest == batch mode restricted to stream-touching pairs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val store = java.nio.file.Files
      .createTempDirectory("graft_mh_ingest").toString + "/sigs"
    Dedup.minHashSignaturesPortable(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, numHashes = 64)
      .write.mode("overwrite").parquet(store)

    val found = scala.collection.mutable.Set.empty[(Long, Long)]
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft_mh_ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val cands = Dedup.minHashIncrementalPortable(
          batch, "doc_id", "text", spark.read.parquet(store),
          n = 3, numHashes = 64, bands = 16, estThreshold = 0.3)
        found.synchronized {
          found ++= cands.select("id_a", "id_b").as[(Long, Long)].collect()
        }
        graft.core.Metrics.drainUnpersist() // free batchSigs checkpoint
        // advance the corpus: append the batch's signatures
        Dedup.minHashSignaturesPortable(batch, "doc_id", "text",
            n = 3, numHashes = 64)
          .write.mode("append").parquet(store)
      }.start()
    try {
      batch1.foreach(r => mem.addData(r))
      stream.processAllAvailable()
      batch2.foreach(r => mem.addData(r))
      stream.processAllAvailable()
    } finally stream.stop()

    val streamedIds = (batch1 ++ batch2).map(_._1).toSet
    val batchMode = Dedup.minHashCandidatesPortable(
        (corpus ++ batch1 ++ batch2).toDF("doc_id", "text"),
        "doc_id", "text", n = 3, numHashes = 64, bands = 16,
        estThreshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter(p => streamedIds(p._1) || streamedIds(p._2))
    assert(found.toSet == batchMode,
      s"streamed=${found.toSet -- batchMode} batchOnly=${batchMode -- found.toSet}")
    // sanity: the expected dups were actually found
    assert(found.contains((1L, 10L)))
    assert(found.contains((3L, 20L)))
    assert(found.contains((11L, 21L))) // cross-batch pair via the store
  }
}
