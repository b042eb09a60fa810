package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: hand-checked structure, symmetry, mass laws. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String)], iters: Int)
      : Map[String, Long] =
    Graph.pagerank(edges.toDF("src", "dst"), iters)
      .as[(String, Long)].collect().toMap

  test("symmetric cycle: all nodes share the same rank, total ~ Scale") {
    // a -> b -> c -> a plus reverse: perfectly symmetric
    val ring = Seq("a" -> "b", "b" -> "c", "c" -> "a",
      "b" -> "a", "c" -> "b", "a" -> "c")
    val r = ranksOf(ring, 4)
    assert(r.values.toSet.size == 1, s"asymmetric ranks: $r")
    val total = r.values.sum
    assert(math.abs(total - Graph.Scale) < 1000L,
      s"mass drifted: $total vs ${Graph.Scale}")
  }

  test("hub in a star graph outranks leaves") {
    val star = Graph.undirect(
      Seq("hub" -> "l1", "hub" -> "l2", "hub" -> "l3", "hub" -> "l4")
        .toDF("src", "dst"))
    val r = Graph.pagerank(star, 5).as[(String, Long)].collect().toMap
    assert(r("hub") > r("l1") * 2)
    assert(Seq("l1", "l2", "l3", "l4").map(r).toSet.size == 1)
  }

  test("undirected fast path matches the general path exactly") {
    val rnd = new scala.util.Random(11)
    val nodes = (0 until 25).map(i => s"n$i")
    val directed = (for (_ <- 0 until 80) yield
      (nodes(rnd.nextInt(25)), nodes(rnd.nextInt(25))))
      .filter { case (a, b) => a != b }.distinct
    val und = Graph.undirect(directed.toDF("src", "dst"))
    val general = Graph.pagerank(und, iters = 3)
      .as[(String, Long)].collect().toMap
    val fast = Graph.pagerank(und, iters = 3, undirected = true)
      .as[(String, Long)].collect().toMap
    assert(fast == general)
  }

  test("matches a driver-side exact integer reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val nodes = (0 until 30).map(i => s"n$i")
    val directed = (for (_ <- 0 until 120) yield
      (nodes(rnd.nextInt(30)), nodes(rnd.nextInt(30))))
      .filter { case (a, b) => a != b }.distinct
    val edges = directed ++ directed.map(_.swap)
    val got = ranksOf(edges, 3)

    // driver-side replay in plain Long arithmetic
    val present = edges.map(_._1).distinct
    val n = present.size
    val r0 = Graph.Scale / n
    val base = (15L * r0) / 100L
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    var rank = present.map(_ -> r0).toMap
    for (_ <- 1 to 3) {
      val mass = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / outdeg(s) }.sum
      }
      rank = present.map(p =>
        p -> (base + (85L * mass.getOrElse(p, 0L)) / 100L)).toMap
    }
    assert(got == rank)
  }

  test("degrees counts both directions, zeros filled") {
    val d = Graph.degrees(Seq(("a", "b"), ("a", "c"), ("b", "c"))
        .toDF("src", "dst"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(d("a") == ((2L, 0L)))
    assert(d("b") == ((1L, 1L)))
    assert(d("c") == ((0L, 2L)))
  }
}
