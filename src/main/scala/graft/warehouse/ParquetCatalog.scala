package graft.warehouse

import graft.merge.CdcMerge
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Spark-native warehouse: each table is a parquet directory under
  * `root/<schema>/<table>`. Replaces the reference's Redshift target for
  * the pure-Spark path; the JDBC DDL path ([[Ddl]]) covers external
  * warehouses.
  *
  * Provides the loader's table lifecycle (SURVEY §2.6):
  *  - D5 table-replace migration = rewrite into `<table>__migrating`, swap;
  *  - D7 release = atomic directory rename of `<table>_reload_<v>`;
  *  - R1-R5 merge = [[CdcMerge.merge]] + rewrite + swap.
  *
  * Writes go to a shadow directory and swap in via two renames — readers
  * never observe a half-written table, matching the reference's
  * transactional discipline (load_processor.go:395-444). At 100 TB the
  * rewrite cost is why real deployments layer a transactional table format
  * on top; the merge itself (broadcast anti-join) only shuffles the
  * micro-batch, never the target.
  */
final class ParquetCatalog(spark: SparkSession, root: String)
    extends TableStore {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def tablePath(schema: String, table: String): String = s"$root/$schema/$table"

  def exists(schema: String, table: String): Boolean = {
    recoverSwap(schema, table)
    fs.exists(new Path(tablePath(schema, table)))
  }

  /** Crash recovery for [[swapInto]]'s two-rename window: if a crash hit
    * between renaming the table aside and renaming the shadow in, the
    * table dir is missing while `<table>__old` holds the full pre-swap
    * data. Restoring it here means the replayed micro-batch (checkpoint
    * at-least-once semantics) merges against the real table — without
    * this, `merge()` would see `!exists` and silently re-create the table
    * from the one batch, and the next swap's trash cleanup would delete
    * the history. */
  private def recoverSwap(schema: String, table: String): Unit =
    AtomicDir.recover(fs, new Path(tablePath(schema, table)))

  def load(schema: String, table: String): DataFrame = {
    recoverSwap(schema, table)
    spark.read.parquet(tablePath(schema, table))
  }

  /** Create-or-replace from a DataFrame (D3 analogue — schema is carried by
    * parquet, no DDL needed). */
  def save(schema: String, table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(tablePath(schema, table))

  /** R5 skipMerge fast path: append-only load. */
  def append(schema: String, table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(tablePath(schema, table))

  override def append(schema: String, table: String, df: DataFrame,
      pks: Seq[String]): Unit = append(schema, table, df)

  /** Full SCD-1 merge of a CDC micro-batch into the table (R1-R4). The
    * result is rewritten through a shadow dir + swap. */
  def merge(schema: String, table: String, stage: DataFrame,
      pks: Seq[String]): Unit = {
    if (!exists(schema, table)) {
      save(schema, table,
        CdcMerge.insertable(CdcMerge.dropDeleteOps(CdcMerge.dedupe(stage, pks))))
    } else {
      val merged = CdcMerge.merge(load(schema, table), stage, pks)
      val shadow = tablePath(schema, table + "__merging")
      merged.write.mode(SaveMode.Overwrite).parquet(shadow)
      swapInto(schema, table, table + "__merging")
    }
  }

  /** D5 — table-replace migration: rewrite with a schema-transforming
    * function, then swap. */
  def migrate(schema: String, table: String)(transform: DataFrame => DataFrame): Unit = {
    val shadow = table + "__migrating"
    transform(load(schema, table)).write.mode(SaveMode.Overwrite)
      .parquet(tablePath(schema, shadow))
    swapInto(schema, table, shadow)
  }

  /** D7 — release: atomically promote `<table><suffix>` (e.g. a
    * `_reload_v2` rebuild) to `<table>`. */
  def release(schema: String, table: String, suffix: String): Unit =
    swapInto(schema, table, table + suffix)

  /** Two-rename swap: target → trash, source → target, drop trash
    * (shared protocol: [[AtomicDir]]). */
  private def swapInto(schema: String, target: String, source: String): Unit =
    AtomicDir.swapInto(fs, new Path(tablePath(schema, target)),
      new Path(tablePath(schema, source)))

  /** S7 — UNLOAD equivalent: export a table (optionally DISTINCT) as CSV,
    * the reference's table-scan-to-object-store path (redshift.go:812-838).
    * Spark writes one file per partition; no manifest needed (S8) — readers
    * list the directory. */
  def unload(schema: String, table: String, outPath: String,
      distinct: Boolean = false): Unit = {
    val df0 = load(schema, table)
    val df = if (distinct) df0.distinct() else df0
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("escape", "\"").csv(outPath)
  }

  def drop(schema: String, table: String): Unit =
    fs.delete(new Path(tablePath(schema, table)), true)

  def listTables(schema: String): Seq[String] = {
    val p = new Path(s"$root/$schema")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }
}
