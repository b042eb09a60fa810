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

  private def fold(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("key", "lineage")
      .agg(min("batch_id").as("batch_id"))

  test("bucketed appends land flat in _delta; compact places them into __bucket dirs") {
    val dir = tmp()
    val s = new StreamStore(spark, dir + "/s", "L", 8, "key")
    s.append(Seq("a", "b", "c", "d").toDF("key"), 0L)
    assert(s.exists && s.activeBuckets == 8)
    val names = new java.io.File(dir + "/s").listFiles().map(_.getName)
    // append = one flat delta write, NO per-bucket fan-out (measured:
    // bucketing each micro-batch cost 64 files + a shuffle a trigger)
    assert(names.contains("_delta") && names.contains("_graft_buckets"),
      names.mkString(","))
    assert(!names.exists(_.startsWith("__bucket=")), names.mkString(","))
    val vis = s.visible(1L).get
    assert(vis.columns.sorted.toSeq == Seq("batch_id", "key", "lineage"))
    assert(vis.select("key").as[String].collect().sorted.toSeq ==
      Seq("a", "b", "c", "d"))
    s.compact(fold)
    val names2 = new java.io.File(dir + "/s").listFiles().map(_.getName)
    assert(names2.exists(_.startsWith("__bucket=")), names2.mkString(","))
    assert(!names2.contains("_delta"), "compact folds the delta away")
    assert(s.visible(1L).get.select("key").as[String].collect().sorted
      .toSeq == Seq("a", "b", "c", "d"))
  }

  test("the marker pins the count: a reader constructed with a different constant cannot mis-prune") {
    val dir = tmp()
    val s8 = new StreamStore(spark, dir + "/s", "L", 8, "key")
    s8.append(Seq("k1", "k2", "k3").toDF("key"), 0L)
    s8.compact(fold) // base now bucketed at 8
    // misconfigured reader/writer: constructor says 32, disk says 8
    val mis = new StreamStore(spark, dir + "/s", "L", 32, "key")
    assert(mis.activeBuckets == 8)
    // its bucketExpr follows the DISK layout, so a probe built from
    // its own bucketExpr still finds every base key; its appends go
    // to the delta leg, which pruning always reads whole
    mis.append(Seq("k4").toDF("key"), 1L)
    val probe = Seq("k1", "k4").toDF("key")
    val touched = probe.select(mis.bucketExpr(col("key")).as("b"))
      .distinct().as[Int].collect().toSeq
    val got = mis.visiblePruned(2L, touched).get
      .join(broadcast(probe), Seq("key"), "left_semi")
      .select("key").as[String].collect().toSet
    assert(got == Set("k1", "k4"))
  }

  test("visiblePruned prunes base partitions, reads the delta whole, keeps visibility") {
    val dir = tmp()
    val s = new StreamStore(spark, dir + "/s", "L", 16, "key")
    val keys = (1 to 64).map(i => s"key_$i")
    s.append(keys.toDF("key"), 0L)
    s.compact(fold) // base = 16 bucket dirs
    s.append(Seq("late").toDF("key"), 5L) // delta leg
    val one = Seq(keys.head).toDF("key")
    val touched = one.select(s.bucketExpr(col("key")).as("b"))
      .distinct().as[Int].collect().toSeq
    val pruned = s.visiblePruned(1L, touched).get
    // the base scan carries a partition filter on the bucket dir
    // column — pruning happens at planning time, not post-scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__bucket"),
      plan.take(2000))
    val got = pruned.join(broadcast(one), Seq("key"), "left_semi")
      .select("key").as[String].collect().toSet
    assert(got == Set(keys.head))
    // visibility on the delta leg: batch 5's append invisible to 5,
    // visible to 6 — regardless of the touched set
    assert(s.visiblePruned(5L, Seq.tabulate(16)(identity)).get
      .filter(col("key") === "late").count() == 0L)
    assert(s.visiblePruned(6L, Seq(0)).get
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

  test("bucketsFor scales the count with store bytes: pow2, floored at the constructor, capped (VERDICT r17 #1)") {
    val dir = tmp()
    val s = new StreamStore(spark, dir + "/s", "L", 4, "key",
      targetBucketBytes = 1024L, maxBuckets = 64)
    assert(s.bucketsFor(0L) == 4, "constructor count is the floor")
    assert(s.bucketsFor(4096L) == 4)
    assert(s.bucketsFor(4097L) == 8, "pow2 round-up")
    assert(s.bucketsFor(10L * 1024) == 16)
    assert(s.bucketsFor(1L << 20) == 64, "maxBuckets caps the dir count")
    val flat = new StreamStore(spark, dir + "/f", "L")
    assert(flat.bucketsFor(1L << 30) == 0, "flat stores stay flat")
  }

  test("compact re-buckets to the size-derived count; pruning follows the new marker") {
    val dir = tmp()
    val s = new StreamStore(spark, dir + "/s", "L", 2, "key",
      targetBucketBytes = 256L, maxBuckets = 32)
    val keys = (1 to 256).map(i => s"key_$i")
    s.append(keys.toDF("key"), 0L)
    assert(s.activeBuckets == 2, "marker pins the constructor count pre-compact")
    s.compact(fold)
    // a 256-key parquet store is well past 2×256 B: the compact must
    // have re-bucketed upward, pow2, marker-pinned
    val n = s.activeBuckets
    assert(n > 2 && (n & (n - 1)) == 0 && n <= 32, s"got $n")
    // pruning on the NEW layout still finds every key via bucketExpr
    val one = Seq(keys.head).toDF("key")
    val touched = one.select(s.bucketExpr(col("key")).as("b"))
      .distinct().as[Int].collect().toSeq
    val got = s.visiblePruned(1L, touched).get
      .join(broadcast(one), Seq("key"), "left_semi")
      .select("key").as[String].collect().toSet
    assert(got == Set(keys.head))
  }

  test("fs metadata is memoized per mutation epoch: a trigger's reads cost at most 2 listings (VERDICT r17 #3)") {
    val dir = tmp()
    val s = new StreamStore(spark, dir + "/s", "L", 8, "key")
    // trigger shape: reads (gate + probe planning), append, reads
    s.exists; s.dataBytes; s.activeBuckets
    assert(s.metaLoads == 1L, "pre-append reads share one snapshot")
    s.append(Seq("a", "b").toDF("key"), 0L)
    s.exists; s.dataBytes; s.activeBuckets; s.visible(1L)
    assert(s.metaLoads == 2L,
      "append invalidates once; post-append reads share the reload")
    // second trigger: same budget
    s.dataBytes; s.append(Seq("c").toDF("key"), 1L); s.exists
    assert(s.metaLoads == 3L, "an unmutated epoch never relists")
    s.compact(fold) // reads the still-valid snapshot, invalidates after
    s.exists; s.dataBytes
    assert(s.metaLoads == 4L,
      "one reload after the compact's swap covers all reads")
  }

  test("buildBloom is a corpus superset; KeyGate classifies skip/gated/fallback/overflow") {
    val dir = tmp()
    val s = new StreamStore(spark, dir + "/s", "L", 8, "key")
    assert(s.buildSketch(1L << 12, 1L << 15) == null,
      "empty store has no sketch")
    assert(s.buildBloom(1L << 12, 1L << 15).isEmpty)
    s.append((1 to 50).map(i => s"k$i").toDF("key"), 0L)
    val bloom = s.buildBloom(1L << 12, 1L << 15)
    assert(bloom.nonEmpty)
    // no false negatives: a batch of stored keys must probe the store
    // (gated, all its buckets touched)
    val all = (1 to 50).map(i => s"k$i").toDF("key")
    val kgAll = KeyGate.plan(s, all, col("key"), bloom, 1000L)
    assert(kgAll.nKeys == 50L && !kgAll.skipStore && !kgAll.fallback)
    assert(kgAll.touched.nonEmpty &&
      kgAll.touched.forall(b => b >= 0 && b < 8))
    // driver bucketOf replicates the writer's pmod(xxhash64, n): the
    // pruned read on the gate's touched set finds every stored key
    val found = s.visiblePruned(1L, kgAll.touched).get
      .join(broadcast(all), Seq("key"), "left_semi").count()
    assert(found == 50L)
    // zero survivors (novel batch, modulo fpp) skips the store read
    val novel = (1 to 20).map(i => s"totally_fresh_$i").toDF("key")
    val kgNovel = KeyGate.plan(s, novel, col("key"), bloom, 1000L)
    if (kgNovel.touched.isEmpty) assert(kgNovel.skipStore)
    // past the cap: fallback + overflow (the capped collect saw only a
    // prefix — the caller must mark its sketch stale)
    val kgCap = KeyGate.plan(s, all, col("key"), bloom, 10L)
    assert(kgCap.fallback && kgCap.overflow && !kgCap.skipStore)
    // a live store with no sketch loaded (raced construction) must not
    // be skipped: gate wide open, fallback consults the full store
    val kgNone = KeyGate.plan(s, all, col("key"), None, 1000L)
    assert(!kgNone.skipStore && kgNone.fallback && !kgNone.overflow)
  }
}
