package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property spec for the two-pass distributed rank against the window
  * form it replaces (VERDICT r13 #7): generated corpora stress exactly
  * the subtle spots — null GROUPS (the null-safe `<=>` offset-join
  * path), null ORDER keys (nulls-first agreement between the boundary
  * comparator and the node's sort), heavy ties (rank must be a valid
  * permutation, and run-boundary prefix sums must be tie-invariant),
  * and IEEE-edge double keys (NaN, ±Inf, −0.0 — the interpreted
  * ordering, the physical sort, and the window must induce the same
  * tie sets). Seeds are fixed: failures replay deterministically.
  */
class RanksPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // (id, group, vLong, vDouble, w) — group/vLong nullable via Option
  private type Row5 = (Long, Option[String], Option[Long], Double, Long)

  private val genRow: Gen[(Option[String], Option[Long], Double, Long)] =
    for {
      g <- Gen.frequency(
        2 -> Gen.const(None),
        3 -> Gen.const(Some("web")), // skew: one heavy group
        1 -> Gen.oneOf("ref", "tiny", "", "αβ").map(Some(_)))
      v <- Gen.frequency(
        1 -> Gen.const(None),
        6 -> Gen.choose(0L, 7L).map(Some(_))) // tie-heavy domain
      d <- Gen.frequency(
        6 -> Gen.choose(-1e6, 1e6),
        1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity,
          Double.NegativeInfinity, -0.0, 0.0))
      w <- Gen.choose(1L, 13L)
    } yield (g, v, d, w)

  private def corpus(seed: Long): Seq[Row5] = {
    val n = sample(Gen.chooseNum(1, 400), seed)
    sample(Gen.listOfN(n, genRow), seed * 31 + 7).zipWithIndex.map {
      case ((g, v, d, w), i) => (i.toLong, g, v, d, w)
    }
  }

  private def df(rows: Seq[Row5]): DataFrame =
    rows.toDF("id", "g", "v", "d", "w")
      .repartition(1 + (rows.size % 13))

  test("parity vs window on a total order: null groups + null long keys") {
    for (seed <- 1L to 6L) {
      val rows = corpus(seed)
      val in = df(rows)
      val w = Window.partitionBy(col("g")).orderBy(col("v").asc, col("id"))
      val want = in
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("w")).over(w))
        .select("id", "rk", "cum")
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      val got = Ranks.grouped(in, Seq("g"), Seq(col("v"), col("id")),
          rankCol = Some("rk"),
          sums = Seq(Ranks.RunSum(col("w"), "cum")),
          numPartitions = 1 + (seed % 7).toInt)
        .select(col("id"), col("rk"), col("cum"))
        .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3)))
        .toMap
      assert(got == want, s"seed $seed (n=${rows.size})")
    }
  }

  test("parity vs window on IEEE-edge double keys (NaN, ±Inf, −0.0)") {
    for (seed <- 10L to 15L) {
      val rows = corpus(seed)
      val in = df(rows)
      val w = Window.partitionBy(col("g")).orderBy(col("d").asc, col("id"))
      val want = in.withColumn("rk", row_number().over(w).cast("long"))
        .select("id", "rk").as[(Long, Long)].collect().toMap
      val got = Ranks.grouped(in, Seq("g"), Seq(col("d"), col("id")),
          rankCol = Some("rk"), numPartitions = 2 + (seed % 5).toInt)
        .select("id", "rk").as[(Long, Long)].collect().toMap
      assert(got == want, s"seed $seed (n=${rows.size})")
    }
  }

  test("ties: valid permutation, value-monotone, tie-invariant run sums") {
    for (seed <- 20L to 24L) {
      val rows = corpus(seed)
      val got = Ranks.grouped(df(rows), Seq("g"), Seq(col("v")),
          rankCol = Some("rk"),
          sums = Seq(Ranks.RunSum(col("w"), "cum")),
          numPartitions = 1 + (seed % 6).toInt)
        .select("g", "v", "w", "rk", "cum").collect()
        .map(r => (Option(r.getString(0)), // null group keeps identity
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          r.getLong(2), r.getLong(3), r.getLong(4)))
      got.groupBy(_._1).foreach { case (g, rs) =>
        // rank multiset is exactly 1..n per group
        assert(rs.map(_._4).sorted.toSeq == (1L to rs.length).toSeq,
          s"seed $seed group $g")
        // ranks monotone in the key, nulls first
        val byRank = rs.sortBy(_._4).map(_._2)
        byRank.zip(byRank.tail).foreach { case (x, y) =>
          assert(x.isEmpty || (y.nonEmpty && x.get <= y.get),
            s"seed $seed group $g: $x then $y") }
        // at each value-run boundary the inclusive running sum equals
        // the exact prefix weight mass — tie permutation cannot move it
        val byVal = rs.groupBy(_._2)
        val sortedVals = byVal.keys.toSeq
          .sortBy(v => (v.nonEmpty, v.getOrElse(Long.MinValue)))
        var prefix = 0L
        sortedVals.foreach { v =>
          prefix += byVal(v).map(_._3).sum
          val runTop = byVal(v).maxBy(_._4)
          assert(runTop._5 == prefix,
            s"seed $seed group $g value $v: ${runTop._5} != $prefix")
        }
      }
    }
  }
}
