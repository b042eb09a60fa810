package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventTimeSpec extends SparkSpec {

  test("T4 extension: watermarked windowed counts over a stream") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("ts", "k")

    val agg = EventTime.windowedCounts(df, "ts", "10 seconds", "5 seconds",
      groupCols = Seq("k"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("win_counts").start()
    try {
      def t(s: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$s%02d")
      mem.addData((t(1), "a"), (t(2), "a"), (t(11), "b"))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      mem.addData((t(40), "a"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT k, n FROM win_counts ORDER BY window_start, k")
        .as[(String, Long)].collect().toSeq
      assert(rows.contains(("a", 2L))) // window [0,10) closed with 2 events
      assert(rows.contains(("b", 1L)))
    } finally q.stop()
  }

  test("T10 extension: sessionize with flatMapGroupsWithState") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val sessions = EventTime.sessionize(mem.toDS(), gapMs = 1000L)
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions").start()
    try {
      // two sessions for u1 (gap > 1000ms between 1200 and 5000), one for u2
      mem.addData(("u1", 100L), ("u1", 700L), ("u1", 1200L), ("u2", 50L))
      q.processAllAvailable()
      mem.addData(("u1", 5000L))
      q.processAllAvailable()
      val out = spark.sql(
        "SELECT key, sessionStartMs, sessionEndMs, events FROM sessions")
        .as[(String, Long, Long, Long)].collect().toSeq
      // first u1 session (100..1200, 3 events) closed by the 5000 event
      assert(out.contains(("u1", 100L, 1200L, 3L)))
    } finally q.stop()
  }

  test("T10 extension: idle open sessions expire via event-time timeout") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val sessions = EventTime.sessionizeExpiring(mem.toDS(), gapMs = 1000L,
      watermarkDelay = "0 seconds", idleMs = 2000L)
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions_exp").start()
    try {
      mem.addData(("idle", 100L), ("idle", 700L))
      q.processAllAvailable()
      // "idle" never sees another event; watermark moves past
      // lastMs + idleMs (700 + 2000) on other keys' traffic only
      mem.addData(("other", 60000L))
      q.processAllAvailable()
      mem.addData(("other", 120000L))
      q.processAllAvailable()
      val out = spark.sql(
        "SELECT key, sessionStartMs, sessionEndMs, events FROM sessions_exp")
        .as[(String, Long, Long, Long)].collect().toSeq
      // the open idle session was flushed without a closing event
      assert(out.contains(("idle", 100L, 700L, 2L)))
    } finally q.stop()
  }
}
