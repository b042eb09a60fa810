package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession builder for the engine: the settings that
  * matter at 100 TB, pre-wired (callers override anything via `extra`).
  *
  *  - AQE on (runtime coalesce + skew-join splitting);
  *  - shuffle partitions sized to the cluster, not the 200 default;
  *  - 128 MiB scan splits (`maxPartitionBytes`) — parquet-friendly;
  *  - UTC session timezone (temporal conversions assume it);
  *  - RocksDB streaming state + changelog checkpointing BY DEFAULT
  *    (measured, `tools.StateBench`: equal trigger wall, 709 vs
  *    58–175 MiB resident at 3.6M keys — at 100 TB key counts the
  *    heap provider is an OOM, so unbounded-state operators like
  *    [[graft.streaming.StreamDedup.againstHistoryStateful]] must not
  *    depend on the caller remembering a conf);
  *  - graft SQL functions registered.
  */
object GraftSession {

  def builder(
      master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors,
      extra: Map[String, String] = Map.empty): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      // cap plan-STRING rendering (default is effectively unlimited):
      // AQE builds explainString per stage update, and a plan carrying
      // a large binary literal (a bloom sketch, a model blob) renders
      // it in full — measured r17: a 2 MiB literal per micro-batch
      // trigger OOM'd the driver building plan strings before any probe
      // ran. 4 MB keeps every legitimate explain readable
      .config("spark.sql.maxPlanStringLength", s"${4 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
    (defaults ++ extra).foldLeft(b) {
      case (bb, (k, v)) => bb.config(k, v) }
  }

  /** Default conf map applied by [[builder]] beyond the literal configs
    * above (callers override any entry via `extra`). Spec-pinned so the
    * RocksDB-state default cannot silently regress
    * (`RocksDbStateSpec`). */
  def defaults: Map[String, String] = rocksdbStateConfs

  /** Streaming-state confs for state that outgrows executor heap:
    * Spark's RocksDB state store (per-user/per-key state lands on
    * executor-local disk, not heap) with changelog checkpointing (per
    * trigger only the CHANGED keys ship to the checkpoint, not a full
    * snapshot — the difference between O(delta) and O(state) commit cost
    * once state is large). The [[builder]] DEFAULT since round 13;
    * override via `extra` (e.g. to A/B the heap provider, as
    * `tools.StateBench` does on plain sessions). */
  val rocksdbStateConfs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      ("org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider"),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  def create(master: String = "local[*]"): SparkSession = {
    val s = builder(master).getOrCreate()
    GraftExtensions.register(s) // idempotent; covers pre-existing sessions
    s
  }
}
