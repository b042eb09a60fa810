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

  /** [[start]] with the rollup persisted through a [[graft.warehouse
    * .TableStore]] instead of the single-directory AtomicDir table:
    * update-mode batches carry FULL updated sums per key, which is
    * exactly an SCD-1 replace-by-key — so each trigger is one
    * `store.merge` with synthetic CDC columns (offset 0, op UPDATE) and
    * the rollup inherits the store's write complexity. With
    * [[graft.warehouse.MergeOnReadCatalog]] a trigger costs O(batch)
    * (delta append; resolution at read time) instead of [[upsert]]'s
    * O(rollup) rewrite — the right substrate when triggers are frequent
    * and the group×day key space is large. Read through
    * [[trendingFrom]]/[[anomaliesFrom]]. */
  def startInto(events: DataFrame, groupCols: Seq[String], dayCol: String,
      valueCol: String, store: graft.warehouse.TableStore, schema: String,
      table: String, checkpoint: String): StreamingQuery = {
    import graft.core.Cdc
    val keys = (groupCols :+ dayCol).map(col)
    events
      .groupBy(keys: _*)
      .agg(sum(col(valueCol)).as("day_value"))
      .writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.merge(schema, table,
          batch.withColumn(Cdc.OffsetColumn, lit(0L))
            .withColumn(Cdc.OperationColumn, lit(Cdc.OpUpdate)),
          groupCols :+ dayCol)
      }
      .start()
  }

  /** [[trending]] over a store-backed rollup ([[startInto]]). */
  def trendingFrom(store: graft.warehouse.TableStore, schema: String,
      table: String, groupCols: Seq[String], dayCol: String,
      refDay: org.apache.spark.sql.Column, halfLifeDays: Int,
      nCol: String = "day_value"): DataFrame =
    graft.ops.Behavior.decayedFromDaily(store.load(schema, table),
      groupCols, dayCol, nCol, refDay, halfLifeDays)

  /** [[anomalies]] over a store-backed rollup ([[startInto]]). */
  def anomaliesFrom(store: graft.warehouse.TableStore, schema: String,
      table: String, groupCols: Seq[String], dayCol: String,
      threshold: Double = 2.0): DataFrame =
    graft.ops.Behavior.dailyAnomaliesFromDaily(store.load(schema, table),
      groupCols, dayCol, threshold)

  /** Replace-by-key upsert of the rollup table (batch carries full
    * updated sums). Left-anti on the batch keys + union, written via
    * the shared shadow-and-swap protocol ([[graft.warehouse.AtomicDir]])
    * so a crash at any point leaves a recoverable table and readers
    * never see a half-written one. The WRITER (single, per streaming
    * semantics) finishes any interrupted swap before reading; a
    * transient read failure fails the trigger instead of silently
    * rebuilding from one batch. */
  private[graft] def upsert(spark: SparkSession, batch: DataFrame,
      keyCols: Seq[String], path: String): Unit = {
    import graft.warehouse.AtomicDir
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicDir.recover(fs, dst)
    val existing =
      if (fs.exists(dst)) Some(spark.read.parquet(path)) else None
    val merged = existing match {
      case Some(cur) =>
        cur.join(batch.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(batch)
      case None => batch
    }
    val tmp = new org.apache.hadoop.fs.Path(path + "__next")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    AtomicDir.swapInto(fs, dst, tmp)
  }

  /** The batch-side anomaly pass over the persisted rollup. READ-ONLY:
    * a concurrent recover here would race the streaming writer mid-swap
    * (renaming `__old` back while the writer renames its shadow in
    * NESTS the shadow inside the restored table); instead read wherever
    * the table currently lives. */
  def anomalies(spark: SparkSession, path: String, groupCols: Seq[String],
      dayCol: String, threshold: Double = 2.0): DataFrame = {
    import graft.warehouse.AtomicDir
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = AtomicDir.readablePath(fs, dst).getOrElse(
      throw new IllegalStateException(s"rollup table $path does not exist"))
    val daily = spark.read.parquet(src.toString)
    graft.ops.Behavior.dailyAnomaliesFromDaily(daily, groupCols, dayCol,
      threshold)
  }

  /** Trending scores off the persisted rollup — the streaming tail of
    * [[graft.ops.Behavior.decayedCounts]]: the stream maintains per-day
    * aggregates; decay re-derives from day ages at READ time, so no
    * state ever needs rescaling as the reference day advances. Same
    * read-only path discipline as [[anomalies]]. `nCol` defaults to the
    * rollup's `day_value` (pass a count column for event-count
    * trending). */
  def trending(spark: SparkSession, path: String, groupCols: Seq[String],
      dayCol: String, refDay: org.apache.spark.sql.Column,
      halfLifeDays: Int, nCol: String = "day_value"): DataFrame = {
    import graft.warehouse.AtomicDir
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = AtomicDir.readablePath(fs, dst).getOrElse(
      throw new IllegalStateException(s"rollup table $path does not exist"))
    graft.ops.Behavior.decayedFromDaily(spark.read.parquet(src.toString),
      groupCols, dayCol, nCol, refDay, halfLifeDays)
  }
}
