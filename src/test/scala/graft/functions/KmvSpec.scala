package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.ops.Dedup

/** KMV bottom-k sketch: aggregate semantics (bounded, distinct, merge-
  * order-free), the union path, the Jaccard estimator's accuracy against
  * exact set Jaccard, and the cardinality estimator's relative error. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("sketch is the k smallest DISTINCT hashes, ascending") {
    // values with duplicates, shuffled across partitions
    val vals = (1L to 200L).flatMap(v => Seq(v * 7, v * 7)) // dup each
    val df = spark.createDataset(scala.util.Random.shuffle(vals))
      .repartition(8).toDF("h")
    val out = df.agg(KmvAggExprs.kmvFromHashes(col("h"), 16).as("s"))
      .head.getSeq[Long](0)
    assert(out == (1L to 16L).map(_ * 7))
  }

  test("fewer distinct values than k → sketch holds them all") {
    val df = Seq(5L, 3L, 5L, 9L, 3L).toDF("h")
    val out = df.agg(KmvAggExprs.kmvFromHashes(col("h"), 64).as("s"))
      .head.getSeq[Long](0)
    assert(out == Seq(3L, 5L, 9L))
  }

  test("kmvUnion of shard sketches == sketch of the concatenation") {
    val a = (1L to 500L).map(_ * 3)
    val b = (1L to 500L).map(_ * 5)
    val direct = spark.createDataset(a ++ b).toDF("h")
      .agg(KmvAggExprs.kmvFromHashes(col("h"), 32).as("s"))
      .head.getSeq[Long](0)
    val viaUnion = Seq(a, b).map(vs =>
        spark.createDataset(vs).toDF("h")
          .agg(KmvAggExprs.kmvFromHashes(col("h"), 32).as("s")))
      .reduce(_ union _)
      .agg(KmvAggExprs.kmvUnion(col("s"), 32).as("s"))
      .head.getSeq[Long](0)
    assert(viaUnion == direct)
  }

  test("kmvSourceOverlap estimate tracks exact shingle Jaccard") {
    // three synthetic sources: A and B share half their docs' text,
    // C is disjoint — the estimator must rank AB far above AC/BC
    val base = (0 until 120).map(i => s"token$i alpha beta gamma $i end")
    val aDocs = base.take(80)
    val bDocs = base.slice(40, 120) // 50% doc overlap with A
    val cDocs = (0 until 80).map(i => s"zeta$i eta theta iota $i tail")
    val df = (aDocs.map(("A", _)) ++ bDocs.map(("B", _)) ++
        cDocs.map(("C", _)))
      .toDF("source", "text")
    val est = Dedup.kmvSourceOverlap(df, "source", "text", n = 3, k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("kmv_jaccard")).toMap
    // exact jaccard per pair, computed with the same shingle pipeline
    val sh = df.select(col("source"),
        explode(Dedup.shingles(col("text"), 3)).as("sh"))
      .distinct().collect()
      .groupBy(_.getString(0)).map { case (s, rs) =>
        s -> rs.map(_.getString(1)).toSet }
    def exact(x: String, y: String): Double =
      (sh(x) & sh(y)).size.toDouble / (sh(x) | sh(y)).size
    val abErr = math.abs(est(("A", "B")) - exact("A", "B"))
    assert(abErr < 0.15, s"AB estimate off by $abErr")
    assert(est(("A", "C")) < 0.05 && est(("B", "C")) < 0.05,
      "disjoint pairs must estimate ~0")
    assert(est(("A", "B")) > est(("A", "C")) + 0.2)
  }

  test("kmvCardinality relative error within KMV bounds") {
    // 10k distinct synthetic shingle hashes via the portable h60
    val n = 10000
    val df = (0 until n).map(i => s"item-$i").toDF("s")
      .select(Portable.h60(col("s")).as("h"))
    val k = 256
    val Row(est: Double) = df
      .agg(KmvAggExprs.kmvFromHashes(col("h"), k).as("sk"))
      .select(Dedup.kmvCardinality(col("sk")))
      .head
    // std error ≈ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.25, s"cardinality est $est for $n")
  }

  test("empty and single-value inputs degrade safely") {
    val empty = spark.emptyDataset[Long].toDF("h")
      .agg(KmvAggExprs.kmvFromHashes(col("h"), 8).as("s"))
      .head.getSeq[Long](0)
    assert(empty.isEmpty)
    val single = Seq(42L).toDF("h")
      .agg(KmvAggExprs.kmvFromHashes(col("h"), 8).as("s"))
    assert(single.head.getSeq[Long](0) == Seq(42L))
    assert(single.select(Dedup.kmvCardinality(col("s"))).head.getDouble(0)
      == 0.0)
  }
}
