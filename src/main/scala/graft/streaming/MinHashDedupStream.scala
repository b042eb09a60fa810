package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming MinHash near-dup dedup — the text twin of
  * [[SemDedupStream]], completing the streaming dedup family (exact
  * keys: [[StreamDedup]]; embeddings: [[SemDedupStream]]; paragraphs:
  * [[ParaDedupStream]]; whole-document text near-dups: this).
  *
  * Per micro-batch of (id, text):
  *
  *  1. signatures once ([[Dedup.minHashSignaturesPortable]]);
  *  2. candidate pairs within the batch AND against the accumulated
  *     signature store ([[Dedup.minHashIncrementalPortable]] — banded,
  *     batch side broadcast, the stored side never re-shingled);
  *  3. greedy keep: a batch doc drops if it pairs with ANY corpus doc
  *     (earlier-arrival-wins) or with a smaller-id batch doc (the batch
  *     operator's min-id rule);
  *  4. survivors' signatures append to the store tagged with
  *     (batch_id, lineage) — the [[ParaDedupStream]] replay trick:
  *     decisions consult only same-lineage `batch_id < current` (other
  *     lineages always count, so a fresh-checkpoint restart keeps the
  *     accumulated corpus), an at-least-once replay excludes its own
  *     failed-attempt appends and reproduces identical output with no
  *     marker file; [[compact]] folds replay duplicates.
  *
  * Scale shape: signatures are batch-linear; the cross lookup explodes
  * band keys on BOTH sides but broadcasts only the batch — the stored
  * side streams through the join and NEVER shuffles. The probe is
  * BLOOM-GATED past `gateFromBytes` (r17, [[KeyGate]]): a driver-held
  * sketch over the corpus's BAND KEYS screens the batch's band keys,
  * and a trigger with zero possible collisions runs only the
  * within-batch self-join — the corpus is not read at all, the
  * novelty-dominated common case. Unlike the key-equality streams the
  * store cannot bucket-prune (each row carries `bands` keys; an
  * exploded bucketed layout would store the signature `bands`× — the
  * documented trade not taken), so a colliding trigger still scans
  * the store once; the skip path is the scale win. Executors hold
  * nothing between triggers.
  */
final class MinHashDedupStream(spark: SparkSession, storePath: String,
    idCol: String, textCol: String,
    n: Int = 3, numHashes: Int = 64, bands: Int = 16,
    estThreshold: Double = 0.5, lineage: String = "default",
    compactEvery: Int = 0, broadcastCap: Long = 1L << 20,
    sketchItems: Long = 1L << 21, sketchBits: Long = 1L << 24,
    gateFromBytes: Long = 64L << 20) {

  private var batchesSeen = 0L
  private var kept = 0L
  private var dropped = 0L

  /** Totals since construction: (batches, survivors, dropped). */
  def stats: (Long, Long, Long) = (batchesSeen, kept, dropped)

  // the shared side-store protocol: recover-on-read, lineage-scoped
  // replay visibility, tagged append, fold-compact (see StreamStore)
  private val store = new StreamStore(spark, storePath, lineage)

  private def bandKeysOf(sigs: org.apache.spark.sql.DataFrame) =
    sigs.select(explode(graft.ops.Dedup.portableBandKeys(col("sig"),
      bands, numHashes / bands)).as("bk"))

  /** One O(store) aggregate over the stored signatures' band keys —
    * the sketch and the band-key row count from the same job. */
  private def buildBandBloom(items: Long, bits: Long)
      : Option[(org.apache.spark.util.sketch.BloomFilter, Long)] =
    store.visible(Long.MaxValue).flatMap { df =>
      val r = bandKeysOf(df.select(col("sig")))
        .agg(graft.functions.Bloom.bloomAgg(xxhash64(col("bk")),
          items, bits), count(lit(1))).head()
      if (r.isNullAt(0)) None
      else Some((org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))),
        r.getLong(1)))
    }

  // live driver-side sketch over the corpus's BAND KEYS — lifecycle
  // (crossing build, saturation rebuild, overflow hysteresis,
  // small-path drop) is the shared [[GateKeeper]]
  private[streaming] val gate = new GateKeeper(store, sketchItems,
    sketchBits, gateFromBytes, buildBandBloom)

  /** The `foreachBatch` body: returns the batch's surviving rows (all
    * original columns), with survivors' signatures already appended.
    * The result rides a deferred localCheckpoint — call
    * `graft.core.Metrics.drainUnpersist()` after sinking it. */
  def processBatch(batch0: DataFrame, batchId: Long): DataFrame = {
    val batch = batch0.localCheckpoint()
    try {
      // signatures once: the gate's band-key collect AND both join
      // sides read this checkpoint (the r16 single-computation rule)
      val batchSigs = Dedup.minHashSignaturesPortable(batch, idCol,
        textCol, n, numHashes).localCheckpoint()
      graft.core.Metrics.deferUnpersist(batchSigs)
      // bloom-gated corpus probe (r17, KeyGate doc): below the
      // threshold, or when any batch band key may collide, consult the
      // corpus as before; zero possible collisions skip the store read
      // entirely (the within-batch self-join still runs)
      val kg = gate.plan(bandKeysOf(batchSigs), col("bk"), broadcastCap)
      // lineage scoping (see ParaDedupStream): other lineages' signatures
      // always count; only the current lineage gets the replay filter —
      // a fresh-checkpoint restart (ids back at 0) must not forget the
      // corpus its predecessor accumulated
      val stored =
        if (kg.skipStore) None
        else store.visible(batchId).map(_.select("id", "sig"))
      val pairs = Dedup.minHashIncrementalFromSigs(batchSigs, stored,
        numHashes, bands, estThreshold).localCheckpoint()
      try {
        // a batch doc loses to a corpus doc on EITHER pair side
        // (corpus ids can exceed batch ids), and to a smaller batch id
        val batchIds = batch.select(col(idCol).as("__bid2")).distinct()
        val tagged = pairs
          .join(batchIds.select(col("__bid2").as("id_a"),
            lit(true).as("__a_in")), Seq("id_a"), "left")
          .join(batchIds.select(col("__bid2").as("id_b"),
            lit(true).as("__b_in")), Seq("id_b"), "left")
        val drops = tagged.select(
          when(col("__a_in").isNull, col("id_b")) // corpus beat id_b
            .when(col("__b_in").isNull, col("id_a")) // corpus beat id_a
            .otherwise(col("id_b")) // both in batch: min-id keeps id_a
            .as("__drop")).distinct()
        val survivors = batch
          .join(drops, col(idCol) === col("__drop"), "left_anti")
          .localCheckpoint()
        // per-trigger checkpoint blocks drain via the deferred pool (the
        // CdcMerge soft-leak discipline) — the caller still reads them
        graft.core.Metrics.deferUnpersist(survivors)
        val nKept = survivors.count()
        val total = batch.count()
        // survivors' signatures come from the SAME checkpointed frame
        // the probe used (r17 — the append previously re-ran the whole
        // shingle→hash→agg pipeline over the survivor texts; signatures
        // are per-document and deterministic, so the filtered frame is
        // identical)
        store.append(batchSigs
          .join(drops, col("id") === col("__drop"), "left_anti")
          .select(col("id"), col("sig")), batchId)
        // keep the band-key gate a corpus superset (batch band keys ⊇
        // survivors'; staleness/saturation rules: GateKeeper doc)
        gate.afterAppend(kg)
        batchesSeen += 1; kept += nKept; dropped += total - nKept
        // cadenced maintenance (the SemDedupStream discipline): folding
        // bounds the per-trigger probe's file listing, decisions unchanged
        if (compactEvery > 0 && batchesSeen % compactEvery == 0) compact()
        survivors
      } finally pairs.unpersist()
    } finally batch.unpersist()
  }

  /** Fold replay-duplicated signature rows (one per (id, lineage) at
    * its min batch_id — other-lineage rows always count as corpus, so
    * per-lineage folding preserves every decision). Shadow-write +
    * swap via the shared [[StreamStore]]. */
  def compact(): Unit = store.compact { df =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id"), col("lineage"))
      .orderBy(col("batch_id"))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
  }
}
