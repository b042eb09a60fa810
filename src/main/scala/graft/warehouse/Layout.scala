package graft.warehouse

import graft.core.TableSpec
import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions.col

/** M9 as physical layout (SURVEY §2.3): the reference tags DISTKEY /
  * SORTKEY in Redshift DDL; the Spark-native equivalents are hash
  * partitioning on the dist column (co-locates merge/join keys, so the
  * per-batch merge shuffles nothing at read time) and sorting within
  * partitions on the sort columns (parquet min/max page stats make range
  * predicates prune — the sortkey scan benefit).
  */
object Layout {

  /** Apply a spec's dist/sort tags to a DataFrame before writing. */
  def arrange(df: DataFrame, spec: TableSpec, numPartitions: Int): DataFrame = {
    val distCols = spec.columns.filter(_.distKey).map(c => col(c.lowerName))
    val sortCols = spec.columns.filter(_.sortOrdinal > 0)
      .sortBy(_.sortOrdinal).map(c => col(c.lowerName))
    val parted =
      if (distCols.nonEmpty) df.repartition(numPartitions, distCols: _*)
      else df.repartition(numPartitions)
    if (sortCols.nonEmpty) parted.sortWithinPartitions(sortCols: _*)
    else parted
  }

  /** Writer with hive-style directory partitioning on the dist column —
    * the lake layout that gives partition pruning on the merge key. */
  def partitionedWriter(df: DataFrame, spec: TableSpec,
      numPartitions: Int): DataFrameWriter[Row] =
    arrange(df, spec, numPartitions).write
}
