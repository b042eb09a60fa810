package graft.warehouse

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Spark-native bucketed catalog tables — the co-location contract
  * CATALYST understands, complementing [[BucketedCatalog]]:
  *
  *  - [[BucketedCatalog]] buckets via a partition DIRECTORY (`bucket=i`):
  *    ideal for the CDC merge's O(affected-buckets) rewrite and partition
  *    pruning, but invisible to the planner's `outputPartitioning`, so
  *    joins still shuffle.
  *  - This store writes `bucketBy(n, pks).sortBy(pks)` catalog tables:
  *    the scan reports HashPartitioning over the bucket keys, so
  *    equi-joins and aggregations on them plan with ZERO Exchange on the
  *    bucketed side(s) — at 100 TB, bucketing both fact tables on the
  *    join key turns the nightly join from a full two-sided shuffle into
  *    a co-located merge (CoLocatedSpec asserts the no-Exchange plan).
  *
  * The two layouts cooperate: land CDC via BucketedCatalog (cheap
  * incremental rewrites), periodically compact hot analytic tables into
  * bucketBy catalog tables keyed on their dominant join key.
  *
  * Bucket-count discipline at scale: both sides of a co-located join must
  * share the bucket count (or one must be a multiple of the other —
  * Spark coalesces via spark.sql.bucketing.coalesceBucketsInJoin); pick
  * n so a bucket's data fits an executor's memory at the target SF.
  */
final class CoLocated(spark: SparkSession, database: String) {

  def init(location: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database LOCATION '$location'")

  private def fq(table: String) = s"$database.$table"

  /** Write `df` as a bucketed+sorted catalog table. Sorting by the bucket
    * keys lets a sort-merge join skip its per-partition sort too (the
    * files are pre-sorted runs). */
  def save(table: String, df: DataFrame, pks: Seq[String],
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, pks.head, pks.tail: _*)
      .sortBy(pks.head, pks.tail: _*)
      .format("parquet")
      .saveAsTable(fq(table))

  def load(table: String): DataFrame = spark.table(fq(table))

  /** Equi-join of two co-bucketed tables on their bucket keys — plans
    * with no Exchange when both were saved with the same nBuckets. */
  def join(left: String, right: String, pks: Seq[String]): DataFrame =
    load(left).join(load(right), pks)

  def drop(table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${fq(table)}")
}
