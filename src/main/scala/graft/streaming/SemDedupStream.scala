package graft.streaming

import graft.ops.{Ivf, SemDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming SemDeDup — the `foreachBatch` twin of
  * [[graft.ops.SemDedup.incrementalAgainstIndex]], completing the
  * StreamDedup/AttributionStream pattern family: exact dedup streams via
  * [[StreamDedup]], semantic dedup streams through this.
  *
  * Per micro-batch of (id, embedding):
  *
  *  1. drop batch rows that near-duplicate the INDEXED corpus —
  *     a partition-pruned scan of only the batch's cells with the batch
  *     broadcast (the `incrementalAgainstIndex` shape: at 100 TB the
  *     corpus side reads |batch cells|/k of the index, never all of it);
  *  2. drop within-batch duplicates among the survivors (greedy min-id
  *     keep, [[graft.ops.SemDedup.keep]] — one deterministic
  *     representative per duplicate chain);
  *  3. [[graft.ops.Ivf.indexAppend]] the survivors, so every LATER batch
  *     dedups against them — earlier-arrival-wins, the streaming analog
  *     of the batch min-id rule;
  *  4. every `compactEvery` batches, [[graft.ops.Ivf.compactIndex]]
  *     rewrites one-file-per-cell: each append adds a file per touched
  *     cell, so a resident stream accumulates small files exactly like
  *     any streaming sink — compaction bounds probe-time listing cost,
  *     and probes return identical results before/after (maintenance,
  *     not retraining).
  *
  * Cell geometry is FROZEN at index-build time (assignment uses the
  * stored model — a projection, no training), so a drifting embedding
  * distribution eventually wants a retrain + reindex; that is corpus
  * maintenance, same cadence class as recall re-measurement.
  *
  * State lives entirely in the index directory — executors hold nothing
  * between triggers, so the stream restarts from the checkpoint with no
  * state recovery beyond the index itself.
  */
final class SemDedupStream(spark: SparkSession, indexPath: String,
    idCol: String, vecCol: String, threshold: Double,
    compactEvery: Int = 16) {

  private var batchesSeen = 0L
  private var appended = 0L
  private var dropped = 0L

  /** Totals since construction: (batches, survivors appended, dropped). */
  def stats: (Long, Long, Long) = (batchesSeen, appended, dropped)

  /** The `foreachBatch` body. Returns the survivor count for the batch
    * (survivors are already appended to the index when this returns). */
  def processBatch(batch: DataFrame): Long = {
    val model = Ivf.loadModel(spark, indexPath)
    // stage 1: batch rows duplicating the corpus (pruned scan × broadcast
    // batch); distinct ids — one batch row can dup many corpus rows
    val corpusDups = SemDedup.incrementalAgainstIndex(spark, indexPath,
      batch, idCol, vecCol, threshold)
      .select(col("id").as("__drop")).distinct()
    val afterCorpus = batch.join(corpusDups,
      col(idCol) === col("__drop"), "left_anti")
    // stage 2: within-batch greedy min-id keep among the remaining rows
    val survivors = SemDedup.keep(afterCorpus, idCol, vecCol, model,
      threshold).localCheckpoint()
    try {
      val n = survivors.count()
      val total = batch.count()
      Ivf.indexAppend(spark, indexPath, survivors, vecCol)
      batchesSeen += 1
      appended += n
      dropped += total - n
      graft.core.Metrics.observe("semdedup_stream", "survivors", n.toDouble)
      graft.core.Metrics.observe("semdedup_stream", "dropped",
        (total - n).toDouble)
      if (compactEvery > 0 && batchesSeen % compactEvery == 0)
        Ivf.compactIndex(spark, indexPath)
      n
    } finally survivors.unpersist()
  }
}
