package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction — the maintenance pass every long-running
  * ingest needs: micro-batch appends leave thousands of KB-sized parquet
  * files per table, and at 100 TB the scan's task-scheduling and footer
  * overhead comes to dominate the read (the classic small-files problem).
  * Compaction rewrites a table into size-targeted files, optionally
  * z-order-clustered, through [[ParquetCatalog.migrate]]'s shadow-write +
  * atomic swap — readers never observe a half-compacted table.
  *
  * Scale notes: the no-cluster path uses `coalesce` (a NARROW
  * dependency — merging small files needs no shuffle at all); the
  * clustered path pays the one range shuffle [[Layout.zorder]] needs.
  * The target partition count comes from the table's actual on-disk
  * bytes, so file sizes track the target regardless of row width.
  */
object Compaction {

  /** Sum of data-file bytes under `path` (hidden/metadata files skipped —
    * a driver-side listing, the same one any planner does). */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var sum = 0L
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) sum += f.getLen
      }
      sum
    }
  }

  /** Output file count for `bytes` of data at `targetFileBytes` each. */
  def targetPartitions(bytes: Long, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
  }

  /** Compact `schema.table` to ~`targetFileBytes` files; with
    * `zorderCols` the rewrite also clusters on the z-curve (multi-column
    * file skipping — [[Layout.zorder]]). Returns the file-count target.
    * Crash-safe: interrupted runs leave the live table untouched and the
    * catalog's swap recovery cleans the shadow. */
  def compact(catalog: ParquetCatalog, spark: SparkSession, schema: String,
      table: String, targetFileBytes: Long,
      zorderCols: Seq[String] = Nil, bits: Int = 16): Int = {
    val bytes = dataBytes(spark, catalog.tablePath(schema, table))
    val n = targetPartitions(bytes, targetFileBytes)
    catalog.migrate(schema, table) { df =>
      if (zorderCols.nonEmpty) Layout.zorder(df, zorderCols.map(col), n, bits)
      // coalesce only REDUCES partition counts — splitting few oversized
      // files into more needs the shuffle; merging many small ones doesn't
      else if (n > df.rdd.getNumPartitions) df.repartition(n)
      else df.coalesce(n)
    }
    n
  }
}
