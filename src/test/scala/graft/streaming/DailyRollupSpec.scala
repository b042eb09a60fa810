package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Behavior

/** Streamed daily rollup + batch z-score tail == one-shot batch
  * anomalies over the same events, including keys updated across
  * triggers (update-mode agg re-emits the full sum). */
class DailyRollupSpec extends SparkSpec {
  import spark.implicits._

  test("rollup across triggers matches batch; re-run is idempotent") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("rollup").toString
    val events = (1 to 30).flatMap(d => Seq(
      ("click", d, if (d == 17) 50.0 else 1.0),
      ("view", d, 2.0)))

    val mem = MemoryStream[(String, Int, Double)]
    // day 17 lands in BOTH triggers → its sum must update, not dup
    mem.addData(events.take(40): _*)
    mem.addData(events.drop(35): _*) // overlap of 5 re-deliveries
    val q = DailyRollup.start(
      mem.toDF().toDF("k", "day", "v"), Seq("k"), "day", "v",
      s"$dir/daily", s"$dir/ck")
    q.awaitTermination()

    val streamed = DailyRollup.anomalies(spark, s"$dir/daily",
      Seq("k"), "day").orderBy("k", "day")
      .as[(String, Int, Double, Double, Boolean)].collect().toSeq

    // batch over the DELIVERED multiset (the overlap rows delivered
    // twice count twice in both paths — at-least-once parity)
    val delivered = events.take(40) ++ events.drop(35)
    val batch = Behavior.dailyAnomalies(
      delivered.toDF("k", "day", "v"), Seq("k"), "day", "v")
      .orderBy("k", "day")
      .as[(String, Int, Double, Double, Boolean)].collect().toSeq
    assert(streamed == batch)
    assert(streamed.exists(r => r._1 == "click" && r._2 == 17 && r._5))
  }

  test("startInto(MOR store): store-backed rollup == AtomicDir rollup, reads agree") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("rollupmor").toString
    def day(d: Int) = java.sql.Date.valueOf(f"2026-01-$d%02d")
    val events = (1 to 20).flatMap(d => Seq(
      ("click", day(d), d.toDouble), ("view", day(d), 2.0)))

    // classic AtomicDir path
    val mem1 = MemoryStream[(String, java.sql.Date, Double)]
    mem1.addData(events.take(24): _*)
    mem1.addData(events.drop(20): _*) // overlap re-deliveries + updates
    DailyRollup.start(mem1.toDF().toDF("k", "day", "v"), Seq("k"), "day",
      "v", s"$dir/daily", s"$dir/ck1").awaitTermination()

    // store-backed path: same triggers through an SCD-1 merge per batch
    val store = new graft.warehouse.MergeOnReadCatalog(spark, s"$dir/mor")
    val mem2 = MemoryStream[(String, java.sql.Date, Double)]
    mem2.addData(events.take(24): _*)
    mem2.addData(events.drop(20): _*)
    DailyRollup.startInto(mem2.toDF().toDF("k", "day", "v"), Seq("k"),
      "day", "v", store, "metrics", "daily", s"$dir/ck2")
      .awaitTermination()

    val a = spark.read.parquet(s"$dir/daily")
      .select("k", "day", "day_value").orderBy("k", "day")
      .as[(String, java.sql.Date, Double)].collect().toSeq
    val b = store.load("metrics", "daily")
      .select("k", "day", "day_value").orderBy("k", "day")
      .as[(String, java.sql.Date, Double)].collect().toSeq
    assert(a == b && a.nonEmpty)

    // and the read tails agree
    val ref = to_date(lit("2026-01-20"))
    val t1 = DailyRollup.trending(spark, s"$dir/daily", Seq("k"), "day",
      ref, 7).orderBy("k").collect().toSeq
    val t2 = DailyRollup.trendingFrom(store, "metrics", "daily", Seq("k"),
      "day", ref, 7).orderBy("k").collect().toSeq
    assert(t1 == t2)
  }

  test("trending off the live rollup == decayed scoring of delivered events") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("rolltrend").toString
    def day(d: Int) = java.sql.Date.valueOf(f"2024-01-$d%02d")
    val events = (1 to 30).flatMap(d => Seq(
      ("click", day(d), 1.0), ("view", day(d), 3.0)))
    val mem = MemoryStream[(String, java.sql.Date, Double)]
    mem.addData(events.take(40): _*)
    mem.addData(events.drop(40): _*)
    val q = DailyRollup.start(
      mem.toDF().toDF("k", "day", "v"), Seq("k"), "day", "v",
      s"$dir/daily", s"$dir/ck")
    q.awaitTermination()
    val ref = to_date(lit("2024-01-30"))
    val streamed = DailyRollup.trending(spark, s"$dir/daily", Seq("k"),
      "day", ref, halfLifeDays = 7)
      .as[(String, Long, Double)].collect().toSet
    val daily = events.toDF("k", "day", "v").groupBy("k", "day")
      .agg(sum(col("v")).as("day_value"))
    val batch = Behavior.decayedFromDaily(daily, Seq("k"), "day",
      "day_value", ref, halfLifeDays = 7)
      .as[(String, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("mid-swap crash: stranded __old restores, history survives") {
    val dir = Files.createTempDirectory("rollupcrash").toString
    val daily = s"$dir/daily"
    DailyRollup.upsert(spark,
      Seq(("a", 1, 10.0), ("a", 2, 20.0)).toDF("k", "day", "day_value"),
      Seq("k", "day"), daily)
    // simulate a crash between the two swap renames: table at __old only
    val fs = new org.apache.hadoop.fs.Path(daily)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(daily),
      new org.apache.hadoop.fs.Path(daily + "__old")))

    DailyRollup.upsert(spark,
      Seq(("a", 2, 25.0)).toDF("k", "day", "day_value"),
      Seq("k", "day"), daily)
    val rows = spark.read.parquet(daily)
      .as[(String, Int, Double)].collect().toSet
    // day 1 survived recovery; day 2 took the replacement value
    assert(rows == Set(("a", 1, 10.0), ("a", 2, 25.0)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(daily + "__old")))
  }
}
