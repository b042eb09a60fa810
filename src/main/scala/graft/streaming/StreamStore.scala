package graft.streaming

import graft.warehouse.AtomicDir
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE copy of the streaming dedup side-store protocol — a
  * (payload…, batch_id, lineage) parquet table over the [[AtomicDir]]
  * swap, previously hand-rolled by [[ParaDedupStream]] (md5 paragraph
  * keys) and [[MinHashDedupStream]] (signatures); commit history shows
  * why one copy matters: the same missed-`recover` crash window had to
  * be fixed in both files at once.
  *
  * Contract (the ParaDedupStream replay trick, shared verbatim):
  *
  *  - '''append''' tags rows with `(batch_id, lineage)`;
  *  - '''visible(batchId)''' returns rows from OTHER lineages entirely,
  *    plus same-lineage rows with `batch_id < batchId` — so an
  *    at-least-once foreachBatch replay excludes its own failed
  *    attempt's appends and reproduces identical output with no marker
  *    file, while a fresh-checkpoint restart (ids back at 0, new
  *    lineage string) inherits the full accumulated corpus;
  *  - '''exists''' doubles as crash recovery: streams are the store's
  *    single writer, so a [[compact]] interrupted between the swap's
  *    two renames (store stranded at `__old`) is finished here — read
  *    without recovering and the corpus would silently look empty,
  *    readmitting every duplicate it ever screened;
  *  - '''compact(fold)''' rewrites the store through the caller's fold
  *    (each stream keeps its own earliest-introduction rule) via
  *    shadow-write + [[AtomicDir.swapInto]] — every crash point leaves
  *    the fold's input recoverable.
  */
final class StreamStore(spark: SparkSession, path: String,
    lineage: String = "default") {

  private val target = new Path(path)
  private def fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recover-then-exists (single-writer store — see class doc). */
  def exists: Boolean = {
    AtomicDir.recover(fs, target)
    fs.exists(target)
  }

  /** Rows batch `batchId` is allowed to consult: other lineages always
    * count as corpus, own lineage only strictly-earlier batches. None
    * when the store has no data yet (callers pick their own empty
    * frame — schemas differ per stream). */
  def visible(batchId: Long): Option[DataFrame] =
    if (exists)
      Some(spark.read.parquet(path)
        .filter(col("lineage") =!= lit(lineage) ||
          col("batch_id") < lit(batchId)))
    else None

  /** Append `rows` tagged with this batch and lineage. Replays append
    * duplicate rows of identical content — membership semantics never
    * notice, and [[compact]] folds them away. */
  def append(rows: DataFrame, batchId: Long): Unit =
    rows.withColumn("batch_id", lit(batchId))
      .withColumn("lineage", lit(lineage))
      .write.mode(SaveMode.Append).parquet(path)

  /** Rewrite the store as `fold(current)` via shadow + atomic swap.
    * The fold must preserve the `(batch_id, lineage)` columns and every
    * earlier batch's decision (each stream keeps min-batch_id per key —
    * the earliest introduction). */
  def compact(fold: DataFrame => DataFrame): Unit = {
    if (!exists) return
    val folded = fold(spark.read.parquet(path)).localCheckpoint()
    try {
      val tmp = new Path(path + "__next")
      folded.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      AtomicDir.swapInto(fs, target, tmp)
    } finally folded.unpersist()
  }
}
