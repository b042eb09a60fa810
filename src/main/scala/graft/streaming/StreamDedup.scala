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
  *  - against-all-history dedup keeps one state entry per distinct key
  *    forever — unboundable by definition. Two scalable shapes:
  *    [[againstHistoryStateful]] keeps the key set in the ENGINE's state
  *    store — on the RocksDB provider
  *    ([[graft.GraftSession.rocksdbStateConfs]]) state lives on
  *    executor-local disk with O(delta) changelog commits, so per-trigger
  *    cost tracks the BATCH, not the accumulated history (measured:
  *    `tools.StateBench`); or `foreachBatch` +
  *    [[graft.ops.Dedup.incremental]] over a PK-bucketed corpus store
  *    ([[graft.warehouse.BucketedCatalog]]), where the anti-join
  *    partition-prunes to the micro-batch's buckets — the right shape when
  *    the key corpus must ALSO be a queryable table, at the cost of a
  *    store probe that grows with corpus size
  *    ([[graft.tools.StoreGrowth]] measures that growth).
  */
object StreamDedup {

  /** Drop rows duplicating a `keys`-equal row seen within the watermark.
    * Rows are emitted immediately (append mode — no watermark-close
    * latency); only the DROP decision is watermark-scoped. */
  def withinWatermark(df: DataFrame, tsCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Against-ALL-history exact dedup inside the stream engine: the first
    * row per `keys` value EVER seen is emitted, every later one dropped.
    * State is the distinct-key set and never expires — it REQUIRES the
    * RocksDB provider ([[graft.GraftSession.rocksdbStateConfs]], the
    * [[graft.GraftSession.builder]] DEFAULT) so that set lives on
    * executor-local disk rather than heap (measured `tools.StateBench`:
    * equal trigger wall, 709 vs 58–175 MiB resident at 3.6M keys — the
    * heap provider is the next OOM at 100 TB key counts); with changelog
    * checkpointing each commit ships only the trigger's new keys. State
    * shards by `HashPartitioning(keys)` across
    * `spark.sql.shuffle.partitions` tasks — size that conf for the KEY
    * CARDINALITY (it is fixed at the first start of a stateful query),
    * not the batch size. */
  def againstHistoryStateful(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** `foreachBatch` body for against-all-history dedup with the bloom
    * fast path ([[graft.ops.Dedup.bloomGate]]): rows the sketch marks
    * definitely-new skip the store lookup entirely; only the flagged
    * slice anti-joins the corpus keys (bucketed-store lookup at scale).
    * Result set is IDENTICAL to [[graft.ops.Dedup.incremental]] — the
    * bloom has no false negatives, so no true duplicate can take the
    * fast path (`StreamDedupSpec` asserts the equivalence); the win is
    * that the expensive exact lookup runs on a few candidate rows
    * instead of the whole micro-batch. */
  def bloomGatedBatch(batch: DataFrame, corpusKeys: DataFrame,
      keyCols: Seq[String], idCol: String,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame =
    bloomGatedBatch(batch, corpusKeys, keyCols, idCol,
      graft.ops.Dedup.bloomSketch(corpusKeys, keyCols, expectedItems,
        numBits))

  /** Long-running form: the sketch is built ONCE outside the stream and
    * OR-updated with each batch's survivor hashes via
    * [[graft.functions.Bloom.update]] (or merged from per-batch sketches
    * with [[graft.functions.Bloom.merge]]) — rebuilding it per
    * micro-batch would re-aggregate the full key history every trigger,
    * costing more than the exact lookup the gate avoids. */
  def bloomGatedBatch(batch: DataFrame, corpusKeys: DataFrame,
      keyCols: Seq[String], idCol: String,
      sketch: Array[Byte]): DataFrame = {
    import graft.ops.Dedup
    import org.apache.spark.sql.functions.col
    val gated = Dedup.bloomGateWith(batch, sketch, keyCols)
    val fast = gated.filter(!col("maybe_seen")).drop("maybe_seen")
    val slow = gated.filter(col("maybe_seen")).drop("maybe_seen")
    // keep-min-per-key commutes with key-membership filtering, so
    // deduping the union equals incremental() on the whole batch
    Dedup.exactKeep(
      fast.unionByName(
        slow.join(corpusKeys.select(keyCols.map(col): _*), keyCols,
          "left_anti")),
      keyCols, idCol)
  }
}
