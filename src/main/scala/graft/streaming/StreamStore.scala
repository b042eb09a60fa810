package graft.streaming

import graft.warehouse.AtomicDir
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE copy of the streaming dedup side-store protocol — a
  * (payload…, batch_id, lineage) parquet table over the [[AtomicDir]]
  * swap, previously hand-rolled by [[ParaDedupStream]] (md5 paragraph
  * keys) and [[MinHashDedupStream]] (signatures); commit history shows
  * why one copy matters: the same missed-`recover` crash window had to
  * be fixed in both files at once.
  *
  * Contract (the ParaDedupStream replay trick, shared verbatim):
  *
  *  - '''append''' tags rows with `(batch_id, lineage)`;
  *  - '''visible(batchId)''' returns rows from OTHER lineages entirely,
  *    plus same-lineage rows with `batch_id < batchId` — so an
  *    at-least-once foreachBatch replay excludes its own failed
  *    attempt's appends and reproduces identical output with no marker
  *    file, while a fresh-checkpoint restart (ids back at 0, new
  *    lineage string) inherits the full accumulated corpus;
  *  - '''exists''' doubles as crash recovery: streams are the store's
  *    single writer, so a [[compact]] interrupted between the swap's
  *    two renames (store stranded at `__old`) is finished here — read
  *    without recovering and the corpus would silently look empty,
  *    readmitting every duplicate it ever screened;
  *  - '''compact(fold)''' rewrites the store through the caller's fold
  *    (each stream keeps its own earliest-introduction rule) via
  *    shadow-write + [[AtomicDir.swapInto]] — every crash point leaves
  *    the fold's input recoverable.
  *
  * ==Key-bucketed layout (r17)==
  *
  * With `buckets > 0` and a `keyCol`, appends land in
  * `__bucket=<pmod(xxhash64(key), buckets)>/` partition directories and
  * a `_graft_buckets` marker (underscore-hidden from Spark) pins the
  * bucket count — the count is layout, not configuration, so a reader
  * constructed with a different constant cannot mis-prune. The layout
  * ON DISK always wins: appends into an existing store follow its
  * marker (legacy stores stay flat — no mixed layouts, which would
  * break partition discovery), and [[compact]] rewrites in the
  * CONSTRUCTOR's layout, which is the migration path both ways.
  *
  * [[visiblePruned]] is the reader payoff: given the bucket ids a
  * micro-batch's (bloom-surviving) keys hash into, the probe scans
  * O(touched buckets) of the corpus instead of O(store) — partition
  * pruning happens at planning time on the `__bucket` directory
  * column. With the per-stream bloom gate in front (survivors ≈ true
  * duplicates + fpp·batch), a novelty-dominated 100 TB ingest touches
  * few buckets per trigger; a zero-survivor trigger never reads the
  * store at all. Reference semantics unchanged
  * (pkg/redshiftloader/loader.go staging-dedupe consults full history;
  * this is the same membership answer, partition-pruned).
  */
final class StreamStore(spark: SparkSession, path: String,
    lineage: String = "default", buckets: Int = 0, keyCol: String = "") {
  require(buckets == 0 || keyCol.nonEmpty,
    "bucketed layout needs the key column name")

  private val target = new Path(path)
  private def fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def marker = new Path(target, "_graft_buckets")

  /** Recover-then-exists (single-writer store — see class doc). A dir
    * holding only hidden files (the marker, an interrupted write's
    * `_temporary`) is NOT data yet — callers would fail schema
    * inference on it. */
  def exists: Boolean = {
    AtomicDir.recover(fs, target)
    fs.exists(target) && fs.listStatus(target).exists { s =>
      val n = s.getPath.getName
      n.startsWith("__bucket=") || !n.startsWith("_")
    }
  }

  /** The bucket count the layout ON DISK pins (0 = flat/legacy), or the
    * constructor's when the store doesn't exist yet. */
  def activeBuckets: Int = {
    AtomicDir.recover(fs, target)
    if (!fs.exists(target)) buckets
    else if (!fs.exists(marker)) 0
    else {
      val in = fs.open(marker)
      try {
        val b = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, "UTF-8"))
        b.readLine().trim.toInt
      } finally in.close()
    }
  }

  /** The bucket a key hashes into under the ACTIVE layout — the same
    * `pmod(xxhash64(key), n)` the writer applies, for callers computing
    * a batch's touched-bucket set. `lit(0)` when the store is flat (the
    * caller's collect stays bounded either way). */
  def bucketExpr(key: Column): Column = {
    val n = activeBuckets
    if (n > 0) pmod(xxhash64(key), lit(n.toLong)).cast("int") else lit(0)
  }

  private def writeMarker(n: Int, dir: Path): Unit = {
    val out = fs.create(new Path(dir, "_graft_buckets"), true)
    try out.write(s"$n\n".getBytes("UTF-8")) finally out.close()
  }

  private def dropBucket(df: DataFrame): DataFrame =
    if (df.columns.contains("__bucket")) df.drop("__bucket") else df

  private def readAll(): DataFrame = dropBucket(spark.read.parquet(path))

  /** Rows batch `batchId` is allowed to consult: other lineages always
    * count as corpus, own lineage only strictly-earlier batches. None
    * when the store has no data yet (callers pick their own empty
    * frame — schemas differ per stream). */
  def visible(batchId: Long): Option[DataFrame] =
    if (exists)
      Some(readAll()
        .filter(col("lineage") =!= lit(lineage) ||
          col("batch_id") < lit(batchId)))
    else None

  /** [[visible]] restricted to the partition directories in
    * `touchedBuckets` — sound ONLY for key-equality probes whose batch
    * keys all hash into that set (a key outside it cannot match a row
    * outside it). Falls back to the full read on a flat store. */
  def visiblePruned(batchId: Long, touchedBuckets: Seq[Int])
      : Option[DataFrame] =
    if (!exists) None
    else if (activeBuckets <= 0) visible(batchId)
    else Some(dropBucket(spark.read.parquet(path)
        .filter(col("__bucket").isin(touchedBuckets: _*)))
      .filter(col("lineage") =!= lit(lineage) ||
        col("batch_id") < lit(batchId)))

  /** Append `rows` tagged with this batch and lineage. Replays append
    * duplicate rows of identical content — membership semantics never
    * notice, and [[compact]] folds them away. Bucketed layout
    * repartitions the (micro-batch-sized) append by bucket first so
    * each append adds at most one file per touched bucket, not
    * `tasks × buckets`. */
  def append(rows: DataFrame, batchId: Long): Unit = {
    val creating = !exists
    val n = if (creating) buckets else activeBuckets
    require(n == 0 || keyCol.nonEmpty,
      s"store at $path is bucketed ($n) but this writer has no keyCol")
    val tagged = rows.withColumn("batch_id", lit(batchId))
      .withColumn("lineage", lit(lineage))
    if (n > 0) {
      tagged
        .withColumn("__bucket",
          pmod(xxhash64(col(keyCol)), lit(n.toLong)).cast("int"))
        .repartition(col("__bucket"))
        .write.partitionBy("__bucket").mode(SaveMode.Append).parquet(path)
      // marker AFTER the first successful write: a crash in between
      // leaves bucketed dirs readable (pruning off until the next
      // append lands) — but never a marker promising absent data
      if (creating || !fs.exists(marker)) writeMarker(n, target)
    } else
      tagged.write.mode(SaveMode.Append).parquet(path)
  }

  /** Rewrite the store as `fold(current)` via shadow + atomic swap.
    * The fold must preserve the `(batch_id, lineage)` columns and every
    * earlier batch's decision (each stream keeps min-batch_id per key —
    * the earliest introduction). Rewrites in the CONSTRUCTOR's layout:
    * compacting is also how a legacy store migrates to bucketed (or
    * back). */
  def compact(fold: DataFrame => DataFrame): Unit = {
    if (!exists) return
    val folded = fold(readAll()).localCheckpoint()
    try {
      val tmp = new Path(path + "__next")
      if (buckets > 0) {
        folded
          .withColumn("__bucket",
            pmod(xxhash64(col(keyCol)), lit(buckets.toLong)).cast("int"))
          .repartition(col("__bucket"))
          .write.partitionBy("__bucket").mode(SaveMode.Overwrite)
          .parquet(tmp.toString)
        writeMarker(buckets, tmp)
      } else
        folded.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      AtomicDir.swapInto(fs, target, tmp)
    } finally folded.unpersist()
  }

  /** Serialized bloom over every `keyCol` value in the store (all
    * lineages, all batches — a replay-safe SUPERSET: bloom false
    * positives only route a key to the exact, visibility-filtered
    * probe, never change its answer). Null when the store is empty.
    * One O(store) scan — build at stream construction, then keep
    * current by merging each trigger's batch sketch
    * ([[graft.functions.Bloom.merge]]); same
    * (expectedItems, numBits) family required for merging. */
  def buildSketch(expectedItems: Long, numBits: Long): Array[Byte] =
    if (!exists || keyCol.isEmpty) null
    else {
      val r = spark.read.parquet(path)
        .agg(graft.functions.Bloom.bloomAgg(xxhash64(col(keyCol)),
          expectedItems, numBits))
        .head()
      if (r.isNullAt(0)) null else r.getAs[Array[Byte]](0)
    }
}

/** The per-trigger corpus-probe gate shared by the StreamStore dedup
  * family (VERDICT r16 → r17 #1 + ADVICE r16 #3). ONE micro-batch-sized
  * aggregate job computes, in a single pass over the batch's keys:
  *
  *  - how many pass the corpus bloom sketch (the only keys that CAN be
  *    corpus members — no false negatives),
  *  - which store buckets those survivors hash into,
  *  - the batch's own key sketch (merged into the running one after the
  *    append, so the gate stays a corpus superset).
  *
  * The plan then classifies the trigger:
  *
  *  - '''skipStore''': zero survivors (or no store) — the corpus is not
  *    consulted at all, the common case of a novelty-dominated ingest;
  *  - gated (neither flag): probe [[StreamStore.visiblePruned]] on the
  *    touched buckets with only the surviving keys broadcast — the
  *    scan is O(touched buckets), the broadcast O(survivors);
  *  - '''fallback''': survivors exceed `broadcastCap` (dup-heavy or
  *    sketch-saturated batch) — the r15 shuffle shape, full store +
  *    non-broadcast join, degrading gracefully where an oversized
  *    broadcast would fail the trigger outright (ADVICE r16).
  *
  * `SPARK_GRAFT_STREAM_GATE=off` forces fallback everywhere — the
  * one-binary A/B lever for the store-growth benches.
  */
private[streaming] object KeyGate {
  final case class Plan(survivors: Long, touched: Seq[Int],
      batchSketch: Array[Byte], gate: Column, skipStore: Boolean,
      fallback: Boolean)

  def enabled: Boolean =
    !sys.env.get("SPARK_GRAFT_STREAM_GATE").exists(_.equalsIgnoreCase("off"))

  def plan(store: StreamStore, batchKeys: DataFrame, key: Column,
      sketch: Array[Byte], broadcastCap: Long, expectedItems: Long,
      numBits: Long): Plan = {
    val mc: Column =
      if (sketch == null) lit(false)
      else coalesce(graft.functions.Bloom.mightContain(lit(sketch),
        xxhash64(key)), lit(false))
    val row: Row = batchKeys.agg(
      sum(when(mc, 1L).otherwise(0L)).as("__n"),
      collect_set(when(mc, store.bucketExpr(key))).as("__b"),
      graft.functions.Bloom.bloomAgg(xxhash64(key), expectedItems,
        numBits).as("__s")).head()
    val n = if (row.isNullAt(0)) 0L else row.getLong(0)
    val touched = if (row.isNullAt(1)) Seq.empty[Int]
      else row.getSeq[Int](1)
    val bs = if (row.isNullAt(2)) null else row.getAs[Array[Byte]](2)
    val storeLive = store.exists
    if (!enabled)
      Plan(n, touched, bs, lit(true), skipStore = !storeLive,
        fallback = true)
    // a live store whose sketch never loaded (constructed before
    // another writer's first append) must NOT be skipped — gate wide
    // open, exact probe decides
    else if (sketch == null && storeLive)
      Plan(n, touched, bs, lit(true), skipStore = false, fallback = true)
    else if (!storeLive || n == 0L)
      Plan(n, touched, bs, mc, skipStore = true, fallback = false)
    else if (n > broadcastCap)
      Plan(n, touched, bs, lit(true), skipStore = false, fallback = true)
    else Plan(n, touched, bs, mc, skipStore = false, fallback = false)
  }
}
