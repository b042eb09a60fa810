package graft.warehouse

import org.apache.spark.sql.DataFrame

/** Minimal store contract the streaming pipeline writes through —
  * implemented by [[ParquetCatalog]] (simple dirs, full-rewrite merge) and
  * [[BucketedCatalog]] (PK-hash buckets, O(affected-buckets) merge). */
trait TableStore {
  def exists(schema: String, table: String): Boolean
  def load(schema: String, table: String): DataFrame
  /** R5 fast path: append-only load. `pks` given for stores that bucket. */
  def append(schema: String, table: String, df: DataFrame,
      pks: Seq[String]): Unit
  /** Full SCD-1 merge of a CDC micro-batch (R1-R4). */
  def merge(schema: String, table: String, stage: DataFrame,
      pks: Seq[String]): Unit
}
