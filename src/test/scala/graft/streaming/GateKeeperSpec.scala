package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r18 [[GateKeeper]] lifecycle — the pieces ADVICE r17 flagged in
  * the four hand-rolled copies plus the VERDICT r17 #1 saturation
  * rule: map-side-deduped capped collect, small-path sketch drop
  * (shrink-then-regrow), overflow hysteresis, and fpp-band rebuild
  * with doubled bits. */
class GateKeeperSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("gatekeeper").toString

  private def mkStore(dir: String) =
    new StreamStore(spark, dir + "/s", "L", 8, "key")

  private def keeper(store: StreamStore, items: Long = 1L << 12,
      bits: Long = 1L << 15, g: Long = 0L, maxBits: Long = 1L << 33) =
    new GateKeeper(store, items, bits, g,
      (it, b) => store.buildBloomCounted(it, b), maxSketchBits = maxBits)

  test("collectHashes dedups map-side: raw rows far past the cap, distinct keys under it, no overflow (ADVICE r17 #2)") {
    // 50k raw rows over 100 distinct keys; per-partition dedup bounds
    // the collect by Σ per-partition distinct (≤ 32×100), NOT raw rows
    val df = spark.range(50000)
      .select(concat(lit("k"), col("id") % 100).as("k"))
    val (hashes, overflow) = KeyGate.collectHashes(df, col("k"), 5000L)
    assert(!overflow, "raw-row count must not trip the cap")
    assert(hashes.length == 100, s"driver dedup: ${hashes.length}")
    // the r17 shape would have overflowed: raw rows (50k) > cap (5k)
    // a genuinely over-cap distinct batch still overflows
    val big = spark.range(8000).select(col("id").cast("string").as("k"))
    val (_, o2) = KeyGate.collectHashes(big, col("k"), 1000L)
    assert(o2, "distinct keys past the cap must overflow")
  }

  test("LongDedupSet: zero tracked out-of-band, repeats dropped, full set passes unknowns through") {
    val s = new LongDedupSet(4, 4)
    assert(s.firstSighting(0L) && !s.firstSighting(0L))
    assert(s.firstSighting(7L) && s.firstSighting(-3L) &&
      s.firstSighting(Long.MinValue) && s.firstSighting(42L))
    assert(!s.firstSighting(7L) && !s.firstSighting(Long.MinValue))
    // at maxEntries=4 the set is full: unknown values pass through
    // (never dropped), known ones still dedup
    assert(s.firstSighting(99L) && s.firstSighting(99L))
    assert(!s.firstSighting(42L))
  }

  test("shrink below the threshold drops the sketch; regrow rebuilds — small-path keys screened (ADVICE r17 #1)") {
    val dir = tmp()
    val store = mkStore(dir)
    store.append((1 to 400).map(i => s"a$i").toDF("key"), 0L)
    val big = store.dataBytes
    // gated trigger past the threshold: sketch built from the store
    val g = keeper(store, g = big / 2)
    val p1 = g.plan((1 to 400).map(i => s"a$i").toDF("key"),
      col("key"), 10000L)
    assert(!p1.smallStore && !p1.skipStore && g.rebuilds == 1L)
    g.afterAppend(p1)
    // compaction shrinks the store under the threshold (the winnow
    // frequency-cap shape): the next trigger takes the small path and
    // must DROP the held sketch — its appends bypass putLong
    store.compact(_.filter(col("key").isin("a1", "a2")))
    assert(store.dataBytes < big / 2, "fixture must shrink below g")
    val pSmall = g.plan(Seq("fresh1", "fresh2").toDF("key"),
      col("key"), 10000L)
    assert(pSmall.smallStore)
    store.append(Seq("fresh1", "fresh2").toDF("key"), 1L)
    g.afterAppend(pSmall)
    // regrow past the threshold
    store.append((1 to 800).map(i => s"b$i").toDF("key"), 2L)
    // a batch carrying the small-path keys: a stale sketch would skip
    // the store (silently missed duplicates); the rebuilt one routes
    // them to the probe
    val p3 = g.plan(Seq("fresh1", "fresh2").toDF("key"),
      col("key"), 10000L)
    assert(g.rebuilds == 2L, "re-crossing must rebuild from the store")
    assert(!p3.skipStore,
      "small-path keys must survive the rebuilt sketch")
  }

  test("overflow hysteresis: over-cap triggers never rebuild; the first under-cap one does (ADVICE r17 #2)") {
    val dir = tmp()
    val store = mkStore(dir)
    store.append((1 to 200).map(i => s"k$i").toDF("key"), 0L)
    val g = keeper(store)
    // two consecutive over-cap triggers: straight to fallback, no
    // O(store) rebuild on either
    for (_ <- 1 to 2) {
      val p = g.plan((1 to 50).map(i => s"k$i").toDF("key"),
        col("key"), 10L)
      assert(p.overflow && p.fallback && g.rebuilds == 0L)
      g.afterAppend(p)
    }
    // first under-cap trigger rebuilds once and gates
    val p3 = g.plan((1 to 50).map(i => s"k$i").toDF("key"),
      col("key"), 10000L)
    assert(!p3.overflow && !p3.fallback && g.rebuilds == 1L)
    assert(!p3.skipStore, "stored keys must survive the fresh sketch")
  }

  test("saturation: inserts past the fpp band double the bits and rebuild on the next trigger (VERDICT r17 #1)") {
    val dir = tmp()
    val store = mkStore(dir)
    store.append((1 to 300).map(i => s"k$i").toDF("key"), 0L)
    val g = keeper(store, items = 4L, bits = 64L)
    val p1 = g.plan((1 to 300).map(i => s"k$i").toDF("key"),
      col("key"), 10000L)
    assert(g.rebuilds == 1L && g.sketchState._1 == 64L)
    g.afterAppend(p1) // 300 puts into 64 bits: est fpp ~1 → double
    // ADVICE r18 #4: the doubling is STAGED for the next rebuild; the
    // live telemetry keeps describing the sketch that is gating — its
    // bits stay 64 and its fpp stays saturated, not the under-reported
    // new-size estimate
    assert(g.stagedBits == 128L, s"staged: ${g.stagedBits}")
    assert(g.sketchState._1 == 64L, s"state: ${g.sketchState}")
    assert(g.sketchState._4 > 0.9,
      s"live fpp must stay saturated until the rebuild: ${g.sketchState}")
    val p2 = g.plan((1 to 300).map(i => s"k$i").toDF("key"),
      col("key"), 10000L)
    assert(g.rebuilds == 2L, "stale-from-saturation must rebuild")
    assert(g.sketchState._1 == 128L, "rebuild promotes the staged size")
    assert(!p2.skipStore)
    // decisions stay sound through the rebuild: stored keys gate to
    // the probe, the saturated-then-rebuilt sketch never skips them
    g.afterAppend(p2)
    assert(g.stagedBits == 256L && g.sketchState._1 == 128L)
  }

  test("maxSketchBits caps the doubling; the capped sketch keeps gating") {
    val dir = tmp()
    val store = mkStore(dir)
    store.append((1 to 300).map(i => s"k$i").toDF("key"), 0L)
    val g = keeper(store, items = 4L, bits = 64L, maxBits = 128L)
    val p1 = g.plan((1 to 300).map(i => s"k$i").toDF("key"),
      col("key"), 10000L)
    g.afterAppend(p1) // 64 → 128 (the cap)
    val p2 = g.plan((1 to 300).map(i => s"k$i").toDF("key"),
      col("key"), 10000L)
    g.afterAppend(p2) // at the cap: saturated but no further growth
    assert(g.sketchState._1 == 128L)
    assert(g.rebuilds == 2L)
    val p3 = g.plan((1 to 300).map(i => s"k$i").toDF("key"),
      col("key"), 10000L)
    // no stale flag pending → no rebuild churn at the cap
    assert(g.rebuilds == 2L && !p3.skipStore)
  }

  test("gate off takes the small path with zero gate work in every stream shape (ADVICE r17 #3)") {
    val dir = tmp()
    val store = mkStore(dir)
    store.append((1 to 100).map(i => s"k$i").toDF("key"), 0L)
    sys.props("graft.stream.gate") = "off"
    try {
      val g = keeper(store)
      val p = g.plan((1 to 100).map(i => s"k$i").toDF("key"),
        col("key"), 10000L)
      assert(p.smallStore && g.rebuilds == 0L,
        "gate off must mean NO sketch build and the r16 broadcast shape")
    } finally sys.props.remove("graft.stream.gate")
  }
}
