package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Model-based checks of the temporal/curation operators against
  * driver-side sequential models on seeded random data (failures replay).
  */
class TemporalModelSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin agrees with the sequential model on random streams") {
    val rnd = new Random(23)
    for (round <- 1 to 8) {
      val quotes = Seq.fill(30)((
        "k" + rnd.nextInt(4), rnd.nextInt(100).toLong,
        rnd.nextInt(1000).toDouble, rnd.nextLong(1000000L)))
      val trades = Seq.fill(20)((
        "k" + rnd.nextInt(5), rnd.nextInt(100).toLong,
        rnd.nextLong(1000000L)))
      // model: latest right row at-or-before, ties -> max seq
      val expect = trades.map { case (k, tt, id) =>
        val cand = quotes.filter(q => q._1 == k && q._2 <= tt)
        id -> (if (cand.isEmpty) None
               else Some(cand.maxBy(q => (q._2, q._4))._3))
      }.toMap
      val got = AsOf.asofJoin(
          trades.toDF("k", "tt", "trade_id"),
          quotes.toDF("k", "qt", "price", "seq"),
          "k", "tt", "qt", payload = Seq("price"), tieBreak = "seq")
        .select("trade_id", "price")
        .as[(Long, Option[Double])].collect().toMap
      assert(got == expect, s"round $round")
    }
  }

  test("rangeJoin agrees with the naive theta-join on random times") {
    val rnd = new Random(29)
    for (round <- 1 to 6) {
      val off = Seq(0L, -50000L, 1L << 55)(round % 3) // incl. > 2^53 regime
      val l = Seq.fill(40)((rnd.nextLong(100000L), off + rnd.nextInt(2000)))
        .zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }
      val r = Seq.fill(40)((rnd.nextLong(100000L), off + rnd.nextInt(2000)))
        .zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }
      val w = rnd.nextInt(300) + 1L
      val expect = (for {
        (li, lt) <- l; (ri, rt) <- r if math.abs(lt - rt) <= w
      } yield (li, ri)).toSet
      val got = AsOf.rangeJoin(
          l.toDF("lid", "lt"), r.toDF("rid", "rt"), "lt", "rt", w)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(got == expect, s"round $round w=$w off=$off")
    }
  }

  test("sessionize agrees with the sequential fold model") {
    val rnd = new Random(31)
    for (round <- 1 to 6) {
      val gap = rnd.nextInt(20) + 5L
      val events = Seq.fill(40)((
        rnd.nextInt(4).toLong, rnd.nextInt(200).toLong))
        .zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
      val expect = events.groupBy(_._1).flatMap { case (_, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._3))
        var sess = 0L; var prev = Long.MinValue
        sorted.map { case (_, t, id) =>
          if (prev == Long.MinValue || t - prev > gap) sess += 1
          prev = t
          id -> sess
        }
      }
      val got = Sessions.assign(events.toDF("uid", "t", "eid"),
          "uid", "t", "eid", gap)
        .select("eid", "sess_id").as[(Long, Long)].collect().toMap
      assert(got == expect, s"round $round gap=$gap")
    }
  }

  test("stratified sampling agrees with the hash-order model") {
    import graft.functions.Portable
    val rnd = new Random(37)
    val rows = Seq.fill(120)((rnd.nextInt(100000).toLong, "s" + rnd.nextInt(3)))
      .distinctBy(_._1)
    val n = 7
    val expect = rows.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy(r => (Portable.h60(r._1.toString), r._1)).take(n).map(_._1)
    }.toSet
    val got = Sampling.stratified(rows.toDF("id", "lang"), Seq("lang"), "id", n)
      .select("id").as[Long].collect().toSet
    assert(got == expect)
  }

  test("topTokenCount agrees with groupBy-max on random token arrays") {
    val rnd = new Random(41)
    val arrays = Seq.fill(50)(
      Seq.fill(rnd.nextInt(30))("w" + rnd.nextInt(8)))
    val expect = arrays.map(a =>
      if (a.isEmpty) 0L
      else a.groupBy(identity).values.map(_.size).max.toLong)
    val got = arrays.zipWithIndex.map { case (a, i) => (i, a) }
      .toDF("i", "toks")
      .orderBy("i")
      .select(TextOps.topTokenCount(col("toks")))
      .as[Long].collect().toSeq
    assert(got == expect)
  }
}
