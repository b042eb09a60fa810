package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // right side: quotes (key, time, price, seq); left side: trades (key, time)
  private def quotes = Seq(
    ("a", 10L, 1.0, 1L),
    ("a", 20L, 2.0, 2L),
    ("a", 20L, 3.0, 3L), // tie on t=20: seq 3 must win
    ("a", 40L, 4.0, 4L),
    ("b", 15L, 9.0, 5L))
    .toDF("k", "qt", "price", "seq")

  private def trades = Seq(
    ("a", 5L, 100L),  // before any quote -> null
    ("a", 20L, 101L), // equal timestamp is inclusive; tie -> seq 3
    ("a", 39L, 102L), // latest earlier quote: t=20 seq 3
    ("a", 40L, 103L), // exactly at t=40
    ("b", 99L, 104L), // different key partition
    ("c", 50L, 105L)) // key with no right rows -> null
    .toDF("k", "tt", "trade_id")

  test("asofJoin: latest right row at-or-before, ties to max tieBreak") {
    val got = AsOf.asofJoin(trades, quotes, "k", "tt", "qt",
        payload = Seq("price"), tieBreak = "seq")
      .select("trade_id", "price")
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      100L -> None, 101L -> Some(3.0), 102L -> Some(3.0),
      103L -> Some(4.0), 104L -> Some(9.0), 105L -> None))
  }

  test("asofJoin keeps every left row and all left columns") {
    val got = AsOf.asofJoin(trades, quotes, "k", "tt", "qt",
      payload = Seq("price", "seq"), tieBreak = "seq")
    assert(got.count() == 6)
    assert(got.columns.toSet == Set("k", "tt", "trade_id", "price", "seq"))
  }

  test("asofJoin: null payload on the latest right row stays null") {
    // the t=30 quote has a null price; trades after it must see null, not
    // reach back to the older non-null quote (row-level as-of semantics)
    val q = Seq(("a", 10L, Some(1.0), 1L), ("a", 30L, None, 2L))
      .toDF("k", "qt", "price", "seq")
    val t = Seq(("a", 35L, 200L)).toDF("k", "tt", "trade_id")
    val got = AsOf.asofJoin(t, q, "k", "tt", "qt",
        payload = Seq("price", "seq"), tieBreak = "seq")
      .select("trade_id", "price", "seq")
      .as[(Long, Option[Double], Long)].collect().toSeq
    assert(got == Seq((200L, None, 2L)))
  }

  test("asofJoin: null keys match nothing (SQL join semantics)") {
    val q = Seq((Option("a"), 10L, 1.0, 1L), (Option.empty[String], 5L, 9.0, 2L))
      .toDF("k", "qt", "price", "seq")
    val t = Seq((Option.empty[String], 20L, 300L), (Option("a"), 20L, 301L))
      .toDF("k", "tt", "trade_id")
    val got = AsOf.asofJoin(t, q, "k", "tt", "qt",
        payload = Seq("price"), tieBreak = "seq")
      .select("trade_id", "price")
      .as[(Long, Option[Double])].collect().toMap
    // the null-keyed trade must NOT pick up the null-keyed quote
    assert(got == Map(300L -> None, 301L -> Some(1.0)))
  }

  test("rangeJoin banding is exact past 2^53 (epoch-nanos regime)") {
    // at 2^60 a double has 128-ns granularity: floor(t/w) via double
    // division misbuckets these and silently drops qualifying pairs
    val base = 1L << 60
    val l = Seq((1L, base + 65L)).toDF("lid", "lt")
    val r = Seq((10L, base + 66L), (11L, base + 1065L), (12L, base - 935L),
      (13L, base + 1066L)).toDF("rid", "rt")
    val banded = AsOf.rangeJoin(l, r, "lt", "rt", width = 1000L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = l.crossJoin(r)
      .filter(abs(col("lt") - col("rt")) <= 1000L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded == naive)
    assert(banded == Set((1L, 10L), (1L, 11L), (1L, 12L)))
  }

  test("rangeJoin: each qualifying pair exactly once, incl. bucket edges") {
    // width 10: buckets are [0,10), [10,20)... values placed to cross edges
    val l = Seq((1L, 9L), (2L, 10L), (3L, 25L)).toDF("lid", "lt")
    val r = Seq((10L, 0L), (11L, 19L), (12L, 20L), (13L, 36L)).toDF("rid", "rt")
    val got = AsOf.rangeJoin(l, r, "lt", "rt", width = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    // |9-0|=9 ok, |9-19|=10 ok (inclusive), |9-20|=11 no
    // |10-0|=10 ok, |10-19|=9 ok, |10-20|=10 ok
    // |25-19|=6 ok, |25-20|=5 ok, |25-36|=11 no
    assert(got == Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 11L), (3L, 12L)))
  }

  test("rangeJoin agrees with the naive theta-join") {
    val l = (0L until 60L).map(i => (i, i * 7L % 97L)).toDF("lid", "lt")
    val r = (0L until 60L).map(i => (i, i * 11L % 89L)).toDF("rid", "rt")
    val banded = AsOf.rangeJoin(l, r, "lt", "rt", width = 5L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = l.crossJoin(r).filter(abs(col("lt") - col("rt")) <= 5)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded == naive && banded.nonEmpty)
  }
}
