package graft.ops

import graft.SparkSpec

/** Equality of the delta (frontier) fixpoint with a driver-side
  * union-find on the adversarial shapes for frontier iteration:
  * long chains (frontier walks), stars (frontier collapses round 1),
  * cliques (dense news), and a mix where most components converge early
  * while one chain keeps the frontier alive — the case where stale
  * labels would survive if the freshness set missed last round's
  * jump-phase changes. */
class ClustersDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map((1L to n).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val minOfRoot = (1L to n).groupBy(find).map {
      case (root, members) => root -> members.min
    }
    (1L to n).map(i => i -> minOfRoot(find(i))).toMap
  }

  private def check(n: Long, edges: Seq[(Long, Long)], label: String): Unit = {
    val got = Dedup.clusters(
      (1L to n).toDF("id0"), "id0", edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(got == unionFind(n, edges), label)
  }

  test("chain: frontier stays a moving window until converged") {
    check(30L, (1L until 30L).map(i => (i, i + 1)), "chain-30")
  }

  test("reversed chain: news flows against the edge direction") {
    // pairs ordered so the min label enters from the HIGH end's perspective
    check(20L, (1L until 20L).map(i => (i, i + 1)).reverse, "rev-chain-20")
  }

  test("star + clique + isolated: frontier empties after round one") {
    val star = (2L to 10L).map(i => (1L, i))
    val clique = (for {
      a <- 11L to 15L; b <- (a + 1) to 15L
    } yield (a, b)).toSeq
    check(18L, star ++ clique, "star+clique+isolated")
  }

  test("mixed: early-converging stars plus one long chain") {
    // stars converge in round 1; the chain keeps iterating — stale star
    // labels must not be re-dirtied, chain news must keep flowing
    val stars = (0 until 5).flatMap(s =>
      (2L to 4L).map(i => (s * 4 + 1L, s * 4 + i)))
    val chain = (21L until 40L).map(i => (i, i + 1))
    check(40L, stars ++ chain, "stars+chain")
  }
}
