package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The engine's window-based sessionizer against Spark's NATIVE
  * `session_window` aggregation: same (key, start, end, count) sessions
  * on a random event log. Two formulations of the same operator — the
  * native one is the streaming-capable physical form (merging session
  * state), ours is the batch window form (single key shuffle, sort
  * reused by the stats aggregate); agreement pins both to the same
  * gap-close semantics.
  *
  * The exact-gap boundary agrees too: both keep an event exactly `gap`
  * after its predecessor IN-SESSION (`diff <= gap`), asserted
  * separately below.
  */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  test("batch sessionizer == native session_window on a random log") {
    val rnd = new Random(11)
    // event times on an even-µs grid; gap odd → no exact-gap ties
    val events = (1 to 4000).map { i =>
      (s"u${rnd.nextInt(40)}", rnd.nextInt(2000000).toLong * 2, i.toLong)
    }
    val gap = 100001L // µs, odd

    val df = events.toDF("k", "t", "id")
    val ours = Sessions.stats(df, "k", "t", "id", gapMicros = gap)
      .select($"k", $"t_start", $"t_end", $"n_events")
      .as[(String, Long, Long, Long)].collect().toSet

    val native = df
      .withColumn("ts", timestamp_micros($"t"))
      .groupBy($"k", session_window($"ts", s"$gap microseconds"))
      .agg(count(lit(1)).as("n"), min($"t").as("t_start"),
        max($"t").as("t_end"))
      .select($"k", $"t_start", $"t_end", $"n")
      .as[(String, Long, Long, Long)].collect().toSet

    assert(ours == native)
    assert(ours.nonEmpty && ours.exists(_._4 > 1))
  }

  test("boundary: an exact-gap event stays in-session on both paths") {
    val df = Seq(("u", 0L, 1L), ("u", 100L, 2L), ("u", 201L, 3L))
      .toDF("k", "t", "id")
    val oursN = Sessions.stats(df, "k", "t", "id", gapMicros = 100L).count()
    val nativeN = df.withColumn("ts", timestamp_micros($"t"))
      .groupBy($"k", session_window($"ts", "100 microseconds"))
      .agg(count(lit(1))).count()
    assert(oursN == 2) // diff == gap joins; diff == gap+1 splits
    assert(nativeN == 2)
  }
}
