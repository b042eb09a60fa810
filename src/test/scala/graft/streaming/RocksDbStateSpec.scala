package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The stateful streaming operators on Spark's RocksDB state store —
  * the production provider for state that outgrows executor heap (per-
  * user funnel/session state at 100 TB event volume is exactly that).
  * A `newSession()` isolates the provider conf from the shared test
  * session; results must be identical to the default provider's, and
  * the per-query progress must prove RocksDB actually served the state.
  */
class RocksDbStateSpec extends SparkSpec {

  private lazy val rocks = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    s
  }

  test("funnel twin on RocksDB: same results, rocksdb metrics visible") {
    implicit val ctx: org.apache.spark.sql.SQLContext = rocks.sqlContext
    import ctx.sparkSession.implicits._
    val mem = MemoryStream[(String, String, Long)]
    val q = FunnelStream.funnelByUser(mem.toDS(), Seq("a", "b"))
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("rocksfunnel").start()
    try {
      mem.addData(("u1", "a", 10L), ("u2", "a", 5L))
      q.processAllAvailable()
      mem.addData(("u1", "b", 20L), ("u2", "b", 1L)) // u2's b precedes a
      q.processAllAvailable()

      val got = rocks.sql(
        "SELECT key, max(stagesReached) FROM rocksfunnel GROUP BY key")
        .as[(String, Int)].collect().toMap
      assert(got == Map("u1" -> 2, "u2" -> 1))

      val metrics = q.lastProgress.stateOperators.head
        .customMetrics.keySet.asScala
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb metrics in $metrics")
    } finally q.stop()
  }

  test("against-history dedup: cross-trigger state, both providers agree") {
    def run(s: org.apache.spark.sql.SparkSession, name: String) = {
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      import ctx.sparkSession.implicits._
      val mem = MemoryStream[(Long, String)]
      val q = StreamDedup.againstHistoryStateful(
        mem.toDF().toDF("id", "k"), Seq("k"))
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(name).start()
      try {
        mem.addData((1L, "a"), (2L, "a"), (3L, "b"))
        q.processAllAvailable()
        // trigger 2: a and b are history now — only c is new
        mem.addData((4L, "a"), (5L, "c"), (6L, "b"))
        q.processAllAvailable()
        // trigger 3: nothing new at all
        mem.addData((7L, "c"), (8L, "a"))
        q.processAllAvailable()
        s.sql(s"SELECT k FROM $name").as[String].collect().toSeq.sorted
      } finally q.stop()
    }
    val onRocks = run(rocks, "rockshist")
    assert(onRocks == Seq("a", "b", "c"),
      "exactly one survivor per key across ALL triggers")
    assert(onRocks == run(spark, "heaphist"))
  }

  test("GraftSession defaults to RocksDB state + changelog checkpointing") {
    // the engine-session default (VERDICT r12 #8): unbounded-state
    // operators (againstHistoryStateful) must not depend on the caller
    // remembering a conf — the builder ships the provider, and heap is
    // the explicit opt-OUT via `extra`
    val d = graft.GraftSession.defaults
    assert(d("spark.sql.streaming.stateStore.providerClass")
      .endsWith("RocksDBStateStoreProvider"))
    assert(d("spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled") == "true")
  }

  test("sessionizer on RocksDB matches the default-provider run") {
    def run(s: org.apache.spark.sql.SparkSession, name: String) = {
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      import ctx.sparkSession.implicits._
      val mem = MemoryStream[(String, Long)]
      val q = EventTime.sessionize(mem.toDS(), gapMs = 100L)
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(name).start()
      try {
        mem.addData(("k", 0L), ("k", 50L), ("k", 400L))
        q.processAllAvailable()
        mem.addData(("k", 1000L)) // closes the 400 session
        q.processAllAvailable()
        s.sql(s"SELECT key, sessionStartMs, sessionEndMs, events FROM $name")
          .as[(String, Long, Long, Long)].collect().toSet
      } finally q.stop()
    }
    assert(run(rocks, "rocksess") == run(spark, "heapsess"))
    assert(run(rocks, "rocksess2").nonEmpty)
  }
}
