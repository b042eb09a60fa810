package graft.ops

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Algebraic laws of the round-13 primitives (two-pass distributed
  * rank, bounded top-k, ntile-from-rank), checked over seeded random
  * corpora (failures replay deterministically). The nondeterministic-
  * pid bug this round shipped and caught (pids disagreeing between the
  * two Ranks branches at sf0.1) motivates randomized parity: every
  * trial varies corpus size, skew, partitioning, and partition count.
  */
class Round13PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260815)

  /** Random skewed corpus: group g_i carries ~4^i rows; weights in
    * 1..13; ids unique. */
  private def corpus(groups: Int, scale: Int): Seq[(String, String, Long)] = {
    var id = 0L
    (0 until groups).flatMap { g =>
      val n = 1 + rnd.nextInt(scale * (1 << (2 * math.min(g, 4))))
      (0 until n).map { _ =>
        id += 1
        (s"id$id", s"g$g", 1L + rnd.nextInt(13))
      }
    }
  }

  private def windowForm(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("g"))
      .orderBy(graft.functions.Portable.h60(col("id")), col("id"))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("w")).over(w))
  }

  test("two-pass rank/running-sum == window form over random skewed corpora") {
    for (trial <- 1 to 4) {
      val rows = corpus(2 + rnd.nextInt(4), 6 + rnd.nextInt(20))
      val df = rows.toDF("id", "g", "w").repartition(1 + rnd.nextInt(13))
      val want = windowForm(df).select("id", "rk", "cum")
        .as[(String, Long, Long)].collect().toSet
      val got = Ranks.grouped(df, Seq("g"),
          Seq(graft.functions.Portable.h60(col("id")), col("id")),
          rankCol = Some("rk"),
          sums = Seq(Ranks.RunSum(col("w"), "cum")),
          numPartitions = 1 + rnd.nextInt(9))
        .select("id", "rk", "cum").as[(String, Long, Long)].collect().toSet
      graft.core.Metrics.drainUnpersist()
      assert(got == want, s"trial $trial (n=${rows.size})")
    }
  }

  test("global rank is a permutation and totals are exact on random corpora") {
    for (trial <- 1 to 3) {
      val rows = corpus(1 + rnd.nextInt(3), 5 + rnd.nextInt(12))
      val df = rows.toDF("id", "g", "w")
      val got = Ranks.grouped(df, Nil, Seq(col("w"), col("id")),
          rankCol = Some("rk"),
          sums = Seq(Ranks.RunSum(col("w"), "cum", totalCol = Some("wt"))),
          totalCountCol = Some("n"),
          numPartitions = 2 + rnd.nextInt(7))
        .select("rk", "cum", "wt", "n").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      graft.core.Metrics.drainUnpersist()
      val n = rows.size.toLong
      val wsum = rows.map(_._3).sum
      assert(got.map(_._1).sorted.toSeq == (1L to n), s"trial $trial")
      assert(got.forall(x => x._3 == wsum && x._4 == n), s"trial $trial")
      // the max-rank row's inclusive running sum is the full weight mass
      assert(got.maxBy(_._1)._2 == wsum, s"trial $trial")
    }
  }

  test("stratifiedTopK == stratified at every k on random corpora") {
    for (trial <- 1 to 3) {
      val rows = corpus(2 + rnd.nextInt(3), 4 + rnd.nextInt(10))
        .map { case (id, g, w) => (id.drop(2).toLong, g, w) }
      val df = rows.toDF("id", "g", "w")
      val k = 1 + rnd.nextInt(12)
      val a = Sampling.stratified(df, Seq("g"), "id", k)
        .select("g", "id", "rk").as[(String, Long, Long)].collect().toSet
      val b = Sampling.stratifiedTopK(df, Seq("g"), "id", k)
        .select("g", "id", "rk").as[(String, Long, Long)].collect().toSet
      graft.core.Metrics.drainUnpersist()
      assert(a == b, s"trial $trial k=$k")
    }
  }

  test("groupedQuantiles == value at ceil(p*n) of the sorted group") {
    for (trial <- 1 to 3) {
      val rows = corpus(2 + rnd.nextInt(3), 4 + rnd.nextInt(10))
      val df = rows.toDF("id", "g", "w")
      val ps = Seq(0.25, 0.5, 0.75, 1.0)
      val got = CorpusStats.groupedQuantiles(df, Seq("g"), "w", ps)
        .select("g", "p", "value").as[(String, Double, Long)]
        .collect().toSet
      graft.core.Metrics.drainUnpersist()
      val want = rows.groupBy(_._2).flatMap { case (g, rs) =>
        val sorted = rs.map(_._3).sorted
        ps.map(p => (g, p,
          sorted(math.ceil(p * sorted.size).toInt - 1)))
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("ntile-from-rank == window ntile on random frames incl. n < k") {
    for (trial <- 1 to 4) {
      val n = 1 + rnd.nextInt(37)
      val vals = (1L to n.toLong).map(i => (i, rnd.nextInt(9).toLong))
      val df = vals.toDF("id", "v")
      val want = df.withColumn("q",
          ntile(5).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select("id", "q").as[(Long, Long)].collect().toMap
      val ranked = Ranks.grouped(df, Nil, Seq(col("v"), col("id")),
        rankCol = Some("__rk"), totalCountCol = Some("__n"),
        numPartitions = 1 + rnd.nextInt(5))
      val got = ranked.select(col("id"),
          when(expr("__rk <= (__n % 5) * ((__n div 5) + 1)"),
            expr("(__rk - 1) div ((__n div 5) + 1) + 1"))
            .otherwise(expr(
              "(__n % 5) + (__rk - 1 - (__n % 5) * ((__n div 5) + 1)) " +
                "div (__n div 5) + 1")).as("q"))
        .as[(Long, Long)].collect().toMap
      graft.core.Metrics.drainUnpersist()
      assert(got == want, s"trial $trial n=$n")
    }
  }
}
