package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming front of [[graft.ops.Behavior.dailyAnomalies]]: the event
  * stream folds into a persistent (group, day) → sum rollup table; the
  * z-score/anomaly pass then runs BATCH-side over the tiny rollup (days
  * × groups), where the cross-day statistics are well-defined. This
  * split is deliberate: per-day sums are streamable state (update-mode
  * agg, exact at every trigger), but a z-score against "all days" is a
  * full-window statistic a stream can only ever approximate — so the
  * engine streams what streams and recomputes the cheap rest, exactly
  * like the CDC path streams merges and leaves analytics batch-side.
  *
  * Update-mode aggregation emits each (group, day)'s FULL updated sum
  * per trigger (not a delta), so the upsert is replace-by-key — crash
  * replay of a trigger is idempotent.
  */
object DailyRollup {

  /** Start the rollup: `events` is a streaming DataFrame with
    * `groupCols`, a `dayCol`, and `valueCol`. Sums persist under
    * `path` as parquet, replaced by key each trigger. */
  def start(events: DataFrame, groupCols: Seq[String], dayCol: String,
      valueCol: String, path: String, checkpoint: String): StreamingQuery = {
    val keys = (groupCols :+ dayCol).map(col)
    events
      .groupBy(keys: _*)
      .agg(sum(col(valueCol)).as("day_value"))
      .writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsert(batch.sparkSession, batch, groupCols :+ dayCol, path)
      }
      .start()
  }

  /** A crash between the two swap renames leaves the table stranded at
    * `__old` and nothing at `path`; finish the interrupted swap before
    * reading (the ParquetCatalog.recoverSwap discipline). Without this,
    * the next trigger would read "no table" and rebuild from one batch —
    * silently truncating the rollup history. */
  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val trash = new org.apache.hadoop.fs.Path(path + "__old")
    if (!fs.exists(dst) && fs.exists(trash) && !fs.rename(trash, dst))
      throw new IllegalStateException(
        s"rollup recovery: failed restoring $trash")
  }

  /** Replace-by-key upsert of the rollup table (batch carries full
    * updated sums). Left-anti on the batch keys + union, written via
    * shadow-and-swap so readers never see a half-written table. */
  private[streaming] def upsert(spark: SparkSession, batch: DataFrame,
      keyCols: Seq[String], path: String): Unit = {
    val fs0 = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs0, path)
    // only an absent table may fall through to the fresh-build branch —
    // a transient read failure must fail the trigger, not truncate the
    // rollup to one batch
    val existing =
      if (fs0.exists(new org.apache.hadoop.fs.Path(path)))
        Some(spark.read.parquet(path))
      else None
    val merged = existing match {
      case Some(cur) =>
        cur.join(batch.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(batch)
      case None => batch
    }
    // shadow-write then two-rename swap (the ParquetCatalog.swapInto
    // discipline): the base is renamed ASIDE before the shadow renames
    // in, so a crash at any point leaves either the old table or the
    // old table recoverable at __old — never a deleted base with the
    // replacement not yet in place
    val tmp = path + "__next"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val dst = new org.apache.hadoop.fs.Path(path)
    val trash = new org.apache.hadoop.fs.Path(path + "__old")
    if (fs.exists(trash)) fs.delete(trash, true)
    if (fs.exists(dst) && !fs.rename(dst, trash))
      throw new IllegalStateException(s"rollup swap: failed renaming $dst aside")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst))
      throw new IllegalStateException(s"rollup swap: failed renaming $tmp in")
    fs.delete(trash, true)
  }

  /** The batch-side anomaly pass over the persisted rollup. */
  def anomalies(spark: SparkSession, path: String, groupCols: Seq[String],
      dayCol: String, threshold: Double = 2.0): DataFrame = {
    recoverSwap(new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), path)
    val daily = spark.read.parquet(path)
    graft.ops.Behavior.dailyAnomaliesFromDaily(daily, groupCols, dayCol,
      threshold)
  }
}
