package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming ingest-time deduplication — the stream-side twin of
  * [[graft.ops.Dedup.incremental]].
  *
  * Two regimes, two state bounds:
  *
  *  - [[withinWatermark]]: exact dedup among events whose event times are
  *    within the watermark delay of each other. State is evicted as the
  *    watermark advances, so executor state is O(keys per watermark
  *    window) — bounded regardless of stream age. This is the correct
  *    primitive for at-least-once sources (Kafka redeliveries, retried
  *    producers) where duplicates arrive CLOSE to the original.
  *
  *  - against-all-history dedup cannot bound state in the stream engine by
  *    definition; the scalable shape is `foreachBatch` +
  *    [[graft.ops.Dedup.incremental]] over a PK-bucketed corpus store
  *    ([[graft.warehouse.BucketedCatalog]]), where the anti-join
  *    partition-prunes to the micro-batch's buckets instead of holding the
  *    corpus's keys in executor memory.
  */
object StreamDedup {

  /** Drop rows duplicating a `keys`-equal row seen within the watermark.
    * Rows are emitted immediately (append mode — no watermark-close
    * latency); only the DROP decision is watermark-scoped. */
  def withinWatermark(df: DataFrame, tsCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys)
}
