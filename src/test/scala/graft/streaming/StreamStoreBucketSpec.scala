package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r17 key-bucketed StreamStore layout: marker-pinned bucket
  * count, partition-pruned probes, legacy↔bucketed migration via
  * compact, and the KeyGate trigger classification — the pieces the
  * bloom-gated stream probes stand on. */
class StreamStoreBucketSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("ssb").toString

  test("bucketed append lays out __bucket dirs + marker; visible drops the column") {
    val dir = tmp()
    val s = new StreamStore(spark, dir + "/s", "L", 8, "key")
    s.append(Seq("a", "b", "c", "d").toDF("key"), 0L)
    assert(s.exists && s.activeBuckets == 8)
    val names = new java.io.File(dir + "/s").listFiles().map(_.getName)
    assert(names.exists(_.startsWith("__bucket=")), names.mkString(","))
    assert(names.contains("_graft_buckets"))
    val vis = s.visible(1L).get
    assert(vis.columns.sorted.toSeq == Seq("batch_id", "key", "lineage"))
    assert(vis.select("key").as[String].collect().sorted.toSeq ==
      Seq("a", "b", "c", "d"))
  }

  test("the marker pins the count: a reader constructed with a different constant cannot mis-prune") {
    val dir = tmp()
    new StreamStore(spark, dir + "/s", "L", 8, "key")
      .append(Seq("k1", "k2", "k3").toDF("key"), 0L)
    // misconfigured reader/writer: constructor says 32, disk says 8
    val mis = new StreamStore(spark, dir + "/s", "L", 32, "key")
    assert(mis.activeBuckets == 8)
    // its bucketExpr and its appends both follow the DISK layout, so a
    // probe built from its own bucketExpr still finds every key
    mis.append(Seq("k4").toDF("key"), 1L)
    val probe = Seq("k1", "k4").toDF("key")
    val touched = probe.select(mis.bucketExpr(col("key")).as("b"))
      .distinct().as[Int].collect().toSeq
    val got = mis.visiblePruned(2L, touched).get
      .join(broadcast(probe), Seq("key"), "left_semi")
      .select("key").as[String].collect().toSet
    assert(got == Set("k1", "k4"))
  }

  test("visiblePruned partition-prunes to the touched buckets and keeps visibility semantics") {
    val dir = tmp()
    val s = new StreamStore(spark, dir + "/s", "L", 16, "key")
    val keys = (1 to 64).map(i => s"key_$i")
    s.append(keys.toDF("key"), 0L)
    s.append(Seq("late").toDF("key"), 5L)
    val one = Seq(keys.head).toDF("key")
    val touched = one.select(s.bucketExpr(col("key")).as("b"))
      .distinct().as[Int].collect().toSeq
    val pruned = s.visiblePruned(1L, touched).get
    // the scan carries a partition filter on the bucket dir column —
    // pruning happens at planning time, not as a post-scan filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__bucket"),
      plan.take(2000))
    // correctness: the touched bucket's matching key is present, the
    // strictly-later batch's row is not (visibility), and nothing
    // outside the touched set can match by construction
    val got = pruned.join(broadcast(one), Seq("key"), "left_semi")
      .select("key").as[String].collect().toSet
    assert(got == Set(keys.head))
    assert(s.visiblePruned(5L, Seq.tabulate(16)(identity)).get
      .filter(col("key") === "late").count() == 0L)
    assert(s.visiblePruned(6L, Seq.tabulate(16)(identity)).get
      .filter(col("key") === "late").count() == 1L)
  }

  test("compact preserves the bucketed layout and migrates a legacy store") {
    val dir = tmp()
    // legacy writer creates a flat store
    val legacy = new StreamStore(spark, dir + "/s", "L")
    legacy.append(Seq("a", "b").toDF("key"), 0L)
    // bucketed-constructor instance follows the DISK layout on append
    val b = new StreamStore(spark, dir + "/s", "L", 8, "key")
    assert(b.activeBuckets == 0)
    b.append(Seq("c").toDF("key"), 1L)
    assert(b.activeBuckets == 0, "append into a flat store must stay flat")
    // compact rewrites in the CONSTRUCTOR's layout: the migration path
    b.compact(_.groupBy("key", "lineage").agg(min("batch_id")
      .as("batch_id")))
    assert(b.activeBuckets == 8)
    assert(b.visible(9L).get.select("key").as[String].collect().sorted
      .toSeq == Seq("a", "b", "c"))
    // and a further compact keeps it bucketed (marker travels the swap)
    b.append(Seq("d").toDF("key"), 2L)
    b.compact(_.groupBy("key", "lineage").agg(min("batch_id")
      .as("batch_id")))
    assert(b.activeBuckets == 8)
    assert(b.visible(9L).get.select("key").as[String].collect().sorted
      .toSeq == Seq("a", "b", "c", "d"))
  }

  test("buildSketch is a corpus superset; KeyGate classifies skip/gated/fallback") {
    val dir = tmp()
    val s = new StreamStore(spark, dir + "/s", "L", 8, "key")
    assert(s.buildSketch(1L << 12, 1L << 15) == null,
      "empty store has no sketch")
    s.append((1 to 50).map(i => s"k$i").toDF("key"), 0L)
    val sk = s.buildSketch(1L << 12, 1L << 15)
    assert(sk != null)
    // no false negatives: every stored key survives
    val all = (1 to 50).map(i => s"k$i").toDF("key")
    val kgAll = KeyGate.plan(s, all, col("key"), sk, 1000L, 1L << 12,
      1L << 15)
    assert(kgAll.survivors == 50L && !kgAll.skipStore && !kgAll.fallback)
    // zero survivors (novel batch, modulo fpp) skips the store read
    val novel = (1 to 20).map(i => s"totally_fresh_$i").toDF("key")
    val kgNovel = KeyGate.plan(s, novel, col("key"), sk, 1000L,
      1L << 12, 1L << 15)
    if (kgNovel.survivors == 0L) assert(kgNovel.skipStore)
    // past the cap: fallback, never an oversized broadcast
    val kgCap = KeyGate.plan(s, all, col("key"), sk, 10L, 1L << 12,
      1L << 15)
    assert(kgCap.fallback && !kgCap.skipStore)
    // a live store with no sketch loaded (raced construction) must not
    // be skipped: gate wide open, fallback consults the full store
    val kgNull = KeyGate.plan(s, all, col("key"), null, 1000L, 1L << 12,
      1L << 15)
    assert(!kgNull.skipStore && kgNull.fallback)
  }
}
