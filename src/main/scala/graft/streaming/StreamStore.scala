package graft.streaming

import graft.warehouse.AtomicDir
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
  * ==Key-bucketed two-tier layout (r17)==
  *
  * With `buckets > 0` and a `keyCol` the store is an LSM-ish pair —
  * the shape the r9 BucketBench notes prescribed for micro-batch
  * writers ("MOR as the streaming substrate; bucketed for key-local
  * reads"):
  *
  *  - '''base''' — `__bucket=<pmod(xxhash64(key), buckets)>/`
  *    partition directories at the store root, rewritten only by
  *    [[compact]]; a `_graft_buckets` marker (underscore-hidden from
  *    Spark) pins the bucket count, so the count is layout, not
  *    configuration, and a reader constructed with a different
  *    constant cannot mis-prune;
  *  - '''delta''' — flat parquet appends under `_delta/` (hidden from
  *    the root read's partition discovery). Appends stay exactly as
  *    cheap as the flat store's — one plain write, no shuffle, no
  *    per-bucket file explosion (measured: bucketing each micro-batch
  *    append directly cost 64 files + a shuffle per trigger and gave
  *    the probe nothing the delta union doesn't).
  *
  * Readers union the legs: [[visiblePruned]] scans base partitions the
  * caller's touched-bucket set selects PLUS the whole delta — the
  * delta is bounded by the compaction cadence (compactEvery batches),
  * so the per-trigger corpus term is O(touched buckets + recent), not
  * O(store). [[compact]] folds base ∪ delta through the stream's rule
  * and rewrites the bucketed base via shadow + [[AtomicDir.swapInto]];
  * the delta directory travels away with the swapped-out root, so
  * every crash point leaves rows either in the old delta or the new
  * base — duplicated at worst, which membership semantics never
  * notice. The layout ON DISK always wins for appends (legacy flat
  * stores stay flat — no mixed layouts); [[compact]] rewrites in the
  * CONSTRUCTOR's layout, the migration path both ways.
  *
  * With the per-stream bloom gate in front (survivors ≈ true
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
  private def deltaDir = new Path(target, "_delta")

  /** Does the base leg hold data: bucket dirs, or (legacy flat store)
    * root-level parquet. A root holding only hidden entries (the
    * marker, `_delta`, an interrupted write's `_temporary`) is not
    * base data — readers would fail schema inference on it. */
  private def baseLive: Boolean =
    fs.exists(target) && fs.listStatus(target).exists { s =>
      val n = s.getPath.getName
      n.startsWith("__bucket=") || !n.startsWith("_")
    }

  private def deltaLive: Boolean =
    fs.exists(deltaDir) && fs.listStatus(deltaDir)
      .exists(s => !s.getPath.getName.startsWith("_"))

  /** Recover-then-exists (single-writer store — see class doc). */
  def exists: Boolean = {
    AtomicDir.recover(fs, target)
    baseLive || deltaLive
  }

  /** Total bytes on disk (both legs) — the gate's cost-model input:
    * below a threshold a full-scan probe beats any index, same as a
    * table scan beats an index seek on a small table. */
  def dataBytes: Long = {
    AtomicDir.recover(fs, target)
    if (!fs.exists(target)) 0L
    else fs.getContentSummary(target).getLength
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

  /** Both legs, bucket column dropped (present only on a bucketed
    * base). Call only when [[exists]]. */
  private def readAll(): DataFrame = {
    val legs =
      (if (baseLive) Seq(dropBucket(spark.read.parquet(path)))
       else Seq.empty) ++
      (if (deltaLive) Seq(spark.read.parquet(deltaDir.toString))
       else Seq.empty)
    legs.reduce(_.unionByName(_))
  }

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

  /** [[visible]] with the BASE leg restricted to the partition
    * directories in `touchedBuckets` — sound ONLY for key-equality
    * probes whose batch keys all hash into that set (a key outside it
    * cannot match a base row outside it). The delta leg always reads
    * whole: it is bounded by the compaction cadence, and its rows are
    * not bucket-placed yet. Falls back to the full read on a flat
    * store. */
  def visiblePruned(batchId: Long, touchedBuckets: Seq[Int])
      : Option[DataFrame] =
    if (!exists) None
    else if (activeBuckets <= 0) visible(batchId)
    else {
      val legs =
        (if (baseLive)
          Seq(dropBucket(spark.read.parquet(path)
            .filter(col("__bucket").isin(touchedBuckets: _*))))
         else Seq.empty) ++
        (if (deltaLive) Seq(spark.read.parquet(deltaDir.toString))
         else Seq.empty)
      if (legs.isEmpty) None
      else Some(legs.reduce(_.unionByName(_))
        .filter(col("lineage") =!= lit(lineage) ||
          col("batch_id") < lit(batchId)))
    }

  /** Append `rows` tagged with this batch and lineage. Replays append
    * duplicate rows of identical content — membership semantics never
    * notice, and [[compact]] folds them away. Bucketed stores append
    * to the flat `_delta/` leg — one plain micro-batch write, no
    * shuffle, no per-bucket file fan-out; [[compact]] does the bucket
    * placement. */
  def append(rows: DataFrame, batchId: Long): Unit = {
    val n = if (fs.exists(target)) activeBuckets else buckets
    val tagged = rows.withColumn("batch_id", lit(batchId))
      .withColumn("lineage", lit(lineage))
    if (n > 0) {
      // marker BEFORE the first delta write: a marker-only root reads
      // as "no data yet" (exists=false), while delta data without a
      // marker would make a later append fall back to the flat layout
      // and fork the store into both
      if (!fs.exists(marker)) { fs.mkdirs(target); writeMarker(n, target) }
      tagged.write.mode(SaveMode.Append).parquet(deltaDir.toString)
    } else
      tagged.write.mode(SaveMode.Append).parquet(path)
  }

  /** Rewrite the store as `fold(base ∪ delta)` via shadow + atomic
    * swap; the delta leg travels away with the swapped-out root. The
    * fold must preserve the `(batch_id, lineage)` columns and every
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

  /** Serialized bloom over every `keyCol` value in the store — BOTH
    * legs, all lineages, all batches: a replay-safe SUPERSET (bloom
    * false positives only route a key to the exact,
    * visibility-filtered probe, never change its answer). Null when
    * the store is empty. One O(store) aggregate — the streams build it
    * when the store first crosses their gate threshold (and when an
    * overflowed trigger staled it), then keep it current with driver
    * `putLong` over each trigger's collected hashes. */
  def buildSketch(expectedItems: Long, numBits: Long): Array[Byte] =
    if (!exists || keyCol.isEmpty) null
    else {
      val r = readAll()
        .agg(graft.functions.Bloom.bloomAgg(xxhash64(col(keyCol)),
          expectedItems, numBits))
        .head()
      if (r.isNullAt(0)) null else r.getAs[Array[Byte]](0)
    }

  /** [[buildSketch]] deserialized to the live driver-side filter the
    * [[KeyGate]] probes (and the stream's putLong keeps current). */
  def buildBloom(expectedItems: Long, numBits: Long)
      : Option[org.apache.spark.util.sketch.BloomFilter] =
    Option(buildSketch(expectedItems, numBits)).map(b =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(b)))
}

/** The per-trigger corpus-probe gate shared by the StreamStore dedup
  * family (VERDICT r16 → r17 #1 + ADVICE r16 #3). ONE micro-batch-sized
  * job collects the batch's DISTINCT key hashes (xxhash64, capped by
  * `broadcastCap`); everything else happens on the DRIVER against a
  * live corpus [[org.apache.spark.util.sketch.BloomFilter]] — no bloom
  * aggregate, no megabyte binary literal, nothing sketch-shaped ever
  * enters a per-trigger plan (a 2 MiB literal per trigger measurably
  * bloats analysis and OOMs `explainString` under AQE):
  *
  *  - survivors = hashes the sketch admits (the only keys that CAN be
  *    corpus members — bloom has no false negatives);
  *  - touched buckets = pmod(surviving hash, activeBuckets) — the same
  *    function the writer applied, replicated in long arithmetic;
  *  - '''skipStore''': zero survivors (or no store) — the corpus is
  *    not consulted at all, the common case of novelty-dominated
  *    ingest;
  *  - gated (neither flag): probe [[StreamStore.visiblePruned]] on the
  *    touched buckets — the scan is O(touched buckets), not O(store);
  *  - '''fallback''': distinct keys exceed `broadcastCap` (`overflow`,
  *    also sets the sketch stale — the capped collect saw only a
  *    prefix, so the stream must rebuild before gating again), or the
  *    sketch is unavailable — full store + non-broadcast join,
  *    degrading gracefully where an oversized broadcast would fail
  *    the trigger outright (ADVICE r16).
  *
  * `SPARK_GRAFT_STREAM_GATE=off` (env) or `graft.stream.gate=off`
  * (sysprop, for in-process A/Bs) disables the gate AND its collect
  * job — the exact r15/r16 probe shape, the A/B baseline.
  */
private[streaming] object KeyGate {
  final case class Plan(nKeys: Long, touched: Seq[Int],
      hashes: Array[Long], skipStore: Boolean, fallback: Boolean,
      overflow: Boolean, smallStore: Boolean = false)

  def enabled: Boolean =
    !sys.props.get("graft.stream.gate")
      .orElse(sys.env.get("SPARK_GRAFT_STREAM_GATE"))
      .exists(_.equalsIgnoreCase("off"))

  /** Spark's `pmod(xxhash64(key), n)` in driver arithmetic. */
  def bucketOf(hash: Long, n: Int): Int = (((hash % n) + n) % n).toInt

  /** The below-threshold plan: no collect job, no sketch — the stream
    * runs the plain broadcast probe (a full scan of a SMALL store is
    * cheaper than any gate, the same cost model that favors table
    * scans over index seeks on small tables). */
  def small(store: StreamStore): Plan =
    Plan(-1L, Seq.empty, Array.empty, skipStore = !store.exists,
      fallback = false, overflow = false, smallStore = true)

  def plan(store: StreamStore, batchKeys: DataFrame, key: Column,
      bloom: Option[org.apache.spark.util.sketch.BloomFilter],
      broadcastCap: Long): Plan = {
    val storeLive = store.exists
    if (!enabled)
      return Plan(-1L, Seq.empty, Array.empty,
        skipStore = !storeLive, fallback = true, overflow = false)
    // ONE job, one stage: collect the batch's raw key hashes (no
    // distinct exchange — the driver dedups in microseconds); the cap
    // bounds both the collect and, post-dedup, the broadcast
    val cap = math.min(broadcastCap, Int.MaxValue - 2L).toInt
    val raw: Array[Long] = batchKeys
      .select(xxhash64(key).as("__h"))
      .limit(cap + 1)
      .collect().map(_.getLong(0))
    val overflow = raw.length > cap
    val hashes = raw.distinct
    val nb = store.activeBuckets
    if (overflow)
      Plan(hashes.length.toLong, Seq.empty, hashes,
        skipStore = !storeLive, fallback = true, overflow = true)
    else if (!storeLive)
      Plan(hashes.length.toLong, Seq.empty, hashes, skipStore = true,
        fallback = false, overflow = false)
    else bloom match {
      // live store, no sketch (raced construction): never skip — gate
      // wide open, the exact probe decides
      case None =>
        Plan(hashes.length.toLong, Seq.empty, hashes, skipStore = false,
          fallback = true, overflow = false)
      case Some(b) =>
        val survivors = hashes.filter(b.mightContainLong)
        val touched =
          if (nb > 0) survivors.map(bucketOf(_, nb)).distinct.toSeq
          else Seq.empty[Int]
        Plan(hashes.length.toLong, touched, hashes,
          skipStore = survivors.isEmpty, fallback = false,
          overflow = false)
    }
  }
}
