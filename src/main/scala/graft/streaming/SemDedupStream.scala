package graft.streaming

import graft.ops.{Ivf, SemDedup}
import org.apache.hadoop.fs.Path
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
  * EXACTLY-ONCE APPEND under foreachBatch's at-least-once contract
  * (ids must be globally unique — the same contract the min-id rule
  * already assumes):
  *
  *  - a `_last_applied_batch` sidecar in the index directory records the
  *    highest applied batch id; a replayed batch (id ≤ marker) returns
  *    without reading anything — the common restart path costs one
  *    driver-side file read;
  *  - the marker is written AFTER the append, so a crash between append
  *    and marker leaves a replay that passes the fast path. That window
  *    is closed by an id anti-join: survivors already present in their
  *    target cells (an id-column-only, partition-pruned read) are not
  *    re-appended. Re-running a batch is therefore a no-op end to end.
  *    (The `__cid =!= __bid` self-guard in `incrementalAgainstIndex`
  *    means a replayed row never dedups against itself, so without the
  *    anti-join it WOULD re-append — the guard is load-bearing.)
  *
  * Per-batch plan hygiene: the batch is `localCheckpoint`ed once at
  * entry (foreachBatch re-derives the source otherwise — every reuse,
  * and `keep`'s self-join reuses twice, would replay the scan), the
  * corpus-dup survivor set is checkpointed before `keep` so the pruned
  * index probe runs once, not once per self-join side, and the centroid
  * model is loaded once per batch and threaded through every stage
  * (previously three sidecar reads per trigger).
  *
  * State lives entirely in the index directory — executors hold nothing
  * between triggers, so the stream restarts from the checkpoint with no
  * state recovery beyond the index + marker sidecar.
  */
final class SemDedupStream(spark: SparkSession, indexPath: String,
    idCol: String, vecCol: String, threshold: Double,
    compactEvery: Int = 16, lineage: String = "default") {

  private var batchesSeen = 0L
  private var appended = 0L
  private var dropped = 0L
  private var replaysSkipped = 0L
  private val phases = scala.collection.mutable.LinkedHashMap(
    "ingest" -> 0.0, "probe" -> 0.0, "keep" -> 0.0, "append" -> 0.0,
    "compact" -> 0.0)

  /** Totals since construction: (batches, survivors appended, dropped). */
  def stats: (Long, Long, Long) = (batchesSeen, appended, dropped)

  /** Batches short-circuited by the replay marker. */
  def skipped: Long = replaysSkipped

  /** Cumulative seconds per phase since construction — the trigger
    * breakdown the bench reports (ingest = checkpoint+count the batch,
    * probe = corpus-dup anti-join, keep = within-batch pairs, append =
    * replay guard + cell write, compact = cadenced rewrite). */
  def phaseTotals: Map[String, Double] = phases.toMap

  /** Marker is scoped per LINEAGE: a new streaming query (fresh
    * checkpoint — foreachBatch ids restart at 0) adopting this index
    * passes a new `lineage` and gets its own marker, so the fast path
    * never skips its early batches; the id anti-join guard keeps the
    * cross-lineage overlap exactly-once regardless. */
  private def markerPath = new Path(indexPath,
    if (lineage == "default") "_last_applied_batch"
    else "_last_applied_batch_" +
      lineage.replaceAll("[^A-Za-z0-9_.-]", "_"))

  private def lastApplied: Long = {
    val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(markerPath)) -1L
    else try {
      val in = fs.open(markerPath)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      s.toLong
    } catch {
      case _: NumberFormatException => -1L // truncated write → guard decides
      case e: Exception =>
        // an IO failure (not a bad marker) also falls back to the
        // anti-join guard — correct, but the disabled fast path must be
        // OBSERVABLE or a persistent FS problem hides as slow triggers
        System.err.println(
          s"[semdedup-stream] marker read failed ($markerPath): $e")
        -1L
    }
  }

  private def writeMarker(batchId: Long): Unit = {
    val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(markerPath, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
  }

  private def timed[A](phase: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body finally phases(phase) += (System.nanoTime() - t0) / 1e9
  }

  /** The `foreachBatch` body. Returns the survivor count for the batch
    * (survivors are already appended to the index when this returns).
    * Pass foreachBatch's `batchId` for the replay fast path; the id
    * anti-join keeps re-runs idempotent even without it. */
  def processBatch(batch0: DataFrame, batchId: Long = -1L): Long = {
    if (batchId >= 0 && batchId <= lastApplied) {
      replaysSkipped += 1
      return 0L
    }
    // one materialization of the source batch; every later stage —
    // including keep's two self-join sides — reads the checkpoint
    val (batch, total) = timed("ingest") {
      val b = batch0.localCheckpoint()
      (b, b.count())
    }
    try {
      val model = Ivf.loadModel(spark, indexPath)
      // stage 1: batch rows duplicating the corpus (pruned scan ×
      // broadcast batch); checkpointed so the probe join runs exactly
      // once — distinct ids, since one batch row can dup many corpus rows.
      // The batch's cell set is collected ONCE here and reused by the
      // append guard (survivor cells ⊆ batch cells): one fewer driver
      // action per trigger, and at small batches per-trigger actions are
      // the throughput floor.
      val (afterCorpus, batchCells) = timed("probe") {
        val cells = Ivf.assign(batch, vecCol, model)
          .select("__cluster").distinct().collect().map(_.getInt(0)).toSeq
        val corpusDups = SemDedup.incrementalAgainstIndex(spark, indexPath,
          batch, idCol, vecCol, threshold, Some(model), Some(cells))
          .select(col("id").as("__drop")).distinct()
        (batch.join(corpusDups, col(idCol) === col("__drop"), "left_anti")
          .localCheckpoint(), cells)
      }
      try {
        // stage 2: within-batch greedy min-id keep among the remaining
        val survivors = timed("keep") {
          SemDedup.keep(afterCorpus, idCol, vecCol, model,
            threshold).localCheckpoint()
        }
        try {
          val n = timed("append") {
            // replay guard (see scaladoc): ids already present in the
            // survivors' target cells are not appended again. Id-column-
            // only pruned read — far cheaper than stage 1's vector scan —
            // over the batch's cells (a superset of the survivors'),
            // saving the per-trigger re-assign + collect.
            val cells = batchCells
            val fresh =
              (if (cells.isEmpty) survivors
               else {
                 val existing = spark.read.parquet(indexPath)
                   .filter(col(Ivf.CellCol).isin(cells: _*))
                   .select(col(idCol))
                 survivors.join(existing, Seq(idCol), "left_anti")
               }).localCheckpoint()
            try {
              val nF = fresh.count()
              Ivf.indexAppend(spark, indexPath, fresh, vecCol, Some(model))
              if (batchId >= 0) writeMarker(batchId)
              nF
            } finally fresh.unpersist()
          }
          batchesSeen += 1
          appended += n
          dropped += total - n
          graft.core.Metrics.observe("semdedup_stream", "survivors",
            n.toDouble)
          graft.core.Metrics.observe("semdedup_stream", "dropped",
            (total - n).toDouble)
          if (compactEvery > 0 && batchesSeen % compactEvery == 0)
            timed("compact") { Ivf.compactIndex(spark, indexPath) }
          n
        } finally survivors.unpersist()
      } finally afterCorpus.unpersist()
    } finally batch.unpersist()
  }
}
