package graft.streaming

import graft.SparkSpec
import graft.mask.{MaskConfig, MaskDiff}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MaskDiffSpec extends AnyFunSuite {

  private val v1 = MaskConfig(
    nonPiiKeys = Map("customers" -> Seq("id"), "orders" -> Seq("id")),
    lengthKeys = Map("customers" -> Seq("email")))

  test("identical configs → no reloads") {
    assert(MaskDiff.identical(v1, v1))
    assert(MaskDiff.changedTables(v1, v1).isEmpty)
  }

  test("changed key class flags only the affected table") {
    val v2 = v1.copy(nonPiiKeys =
      Map("customers" -> Seq("id", "email"), "orders" -> Seq("id")))
    assert(MaskDiff.changedTables(v1, v2) == Set("customers"))
  }

  test("table added or removed from a key class is a change") {
    val v2 = v1.copy(mobileKeys = Map("suppliers" -> Seq("phone")))
    assert(MaskDiff.changedTables(v1, v2) == Set("suppliers"))
    assert(MaskDiff.changedTables(v2, v1) == Set("suppliers"))
  }
}

class ControlPlaneSpec extends AnyFunSuite {

  test("T9 randomize stays within ±pct and is seed-deterministic") {
    for (_ <- 1 to 100) {
      val v = ControlPlane.randomize(1800, 0.2)
      assert(v >= 1440 && v <= 2160)
    }
    assert(ControlPlane.randomize(1800, 0.2, Some(7L)) ==
      ControlPlane.randomize(1800, 0.2, Some(7L)))
    assert(ControlPlane.randomize(100, 0.0) == 100)
  }

  test("O5 unit allocation: lowest last-offset first, capped") {
    val (alloc, deferred) = ControlPlane.allocateReloadUnits(
      Seq("t_big" -> 900L, "t_small" -> 10L, "t_mid" -> 500L), 2)
    assert(alloc == Seq("t_small", "t_mid"))
    assert(deferred == Seq("t_big"))
  }

  test("R11 chunked grouping") {
    assert(ControlPlane.chunkTopics(Seq("a", "b", "c", "d", "e"), 2) ==
      Seq(Seq("a", "b"), Seq("c", "d"), Seq("e")))
    assert(ControlPlane.releaseBatch(1 to 10, 5) == (1 to 5))
  }

  test("T8 throttle budget tiers match the reference") {
    import ControlPlane.{throttleBudget, ThrottleBudget}
    // loader_handler.go:166-186
    assert(throttleBudget(5.0, firstLoad = true) == ThrottleBudget(120, 15))
    assert(throttleBudget(5.0, firstLoad = false) == ThrottleBudget(3, 10))
    assert(throttleBudget(0.0, firstLoad = true) == ThrottleBudget(8, 900))
    assert(throttleBudget(0.0, firstLoad = false) == ThrottleBudget(4, 900))
    // metrics disabled: uniform tiering on firstLoad only
    assert(throttleBudget(99.0, firstLoad = true, usageKnown = false) ==
      ThrottleBudget(120, 15))
    assert(throttleBudget(99.0, firstLoad = false, usageKnown = false) ==
      ThrottleBudget(10, 15))
  }

  test("T8 throttle waits for a slot, barges after budget, skips reloads") {
    import ControlPlane.{throttle, ThrottleBudget}
    val slept = collection.mutable.Buffer.empty[Int]
    // slot frees after 2 checks
    var calls = 0
    val freeing = () => { calls += 1; if (calls > 2) 3 else 99 }
    assert(throttle(ThrottleBudget(10, 15), freeing, sleep = slept.append(_)))
    assert(slept.toSeq == Seq(15, 15))
    // never frees: budget exhausts, returns false ("go load!" anyway)
    slept.clear()
    assert(!throttle(ThrottleBudget(3, 10), () => 99, sleep = slept.append(_)))
    assert(slept.toSeq == Seq(10, 10, 10))
    // reload sink group is never throttled
    slept.clear()
    assert(throttle(ThrottleBudget(3, 10), () => 99, isReload = true,
      sleep = slept.append(_)))
    assert(slept.isEmpty)
    // admission boundary matches the reference's <= (loader_handler.go:231):
    // AT the watermark a load is admitted without waiting
    slept.clear()
    assert(throttle(ThrottleBudget(3, 10), () => ControlPlane.MaxRunningLoaders,
      sleep = slept.append(_)))
    assert(slept.isEmpty)
    assert(!throttle(ThrottleBudget(1, 10),
      () => ControlPlane.MaxRunningLoaders + 1, sleep = slept.append(_)))
  }

  test("T8 usage-aware max wait: hot capped at base, cold floored at base") {
    for (seed <- 1L to 50L) {
      val hot = ControlPlane.usageMaxWait(60, queries = 5.0, seed = Some(seed))
      val cold = ControlPlane.usageMaxWait(60, queries = 0.0, seed = Some(seed))
      assert(hot >= 48 && hot <= 60)
      assert(cold >= 60 && cold <= 72)
    }
  }
}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("S4 NDJSON.gz: gzip objects, null fields omitted (P10 on disk)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ndjson").toString
    val df = Seq(("1", "a", null: String), ("2", null, "x"))
      .toDF("kafkaoffset", "v1", "v2")
    NdjsonGzSink.write(df.coalesce(1), dir)
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.nonEmpty)
    // raw content: null fields absent, so COPY-style readers see NULL
    val src = scala.io.Source.fromInputStream(
      new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(files.head)))
    val lines = try src.getLines().toSeq finally src.close()
    assert(lines.size == 2)
    assert(lines.exists(l => l.contains("\"v1\":\"a\"") && !l.contains("v2")))
    // roundtrip
    val back = NdjsonGzSink.read(spark, dir)
    assert(back.count() == 2)
    assert(back.filter(col("kafkaoffset") === "2")
      .select("v1").head().isNullAt(0))
  }

  test("S7 unload: distinct CSV export") {
    import graft.warehouse.ParquetCatalog
    val root = java.nio.file.Files.createTempDirectory("graft-unl").toString
    val cat = new ParquetCatalog(spark, root)
    cat.save("s", "t", Seq((1, "a"), (1, "a"), (2, "b")).toDF("pk", "v"))
    val out = s"$root/unloaded"
    cat.unload("s", "t", out, distinct = true)
    assert(spark.read.option("header", "true").csv(out).count() == 2)
  }
}

class RealtimeTrackerSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("R9/O4 lag from streaming progress; realtime threshold") {
    import spark.implicits._
    val tracker = new RealtimeTracker(maxLagRows = 100)
    spark.streams.addListener(tracker)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Int]
    val q = mem.toDF().writeStream.queryName("rt-test")
      .format("noop").start()
    try {
      mem.addData(1 to 10: _*)
      q.processAllAvailable()
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (tracker.lag("rt-test").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(tracker.lag("rt-test").contains(10L))
      assert(tracker.realtime("rt-test")) // 10 <= 100
      assert(!new RealtimeTracker(5).realtime("rt-test")) // empty tracker
    } finally {
      q.stop()
      spark.streams.removeListener(tracker)
    }
  }
}
