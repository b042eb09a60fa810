package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clusters around (10,0) and (0,10)
  private def vecs = ((0 until 20).map(i =>
    (i.toLong, Array(10f + (i % 5) * 0.1f, (i % 3) * 0.1f))) ++
    (20 until 40).map(i =>
      (i.toLong, Array((i % 3) * 0.1f, 10f + (i % 5) * 0.1f))))
    .toDF("vec_id", "embedding")

  test("train converges to the two cluster centers; deterministic") {
    val m1 = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 3)
    val m2 = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 3)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    val centers = m1.centroids.map(c => (c(0).round, c(1).round)).toSet
    assert(centers == Set((10L, 0L), (0L, 10L)))
  }

  test("assign puts each vector in its cluster") {
    val m = Ivf.train(vecs, "vec_id", "embedding", k = 2)
    val assigned = Ivf.assign(vecs, "embedding", m)
      .select("vec_id", "__cluster").as[(Long, Int)].collect().toMap
    val clusterOfFirst = assigned(0L)
    assert((0L until 20L).forall(assigned(_) == clusterOfFirst))
    assert((20L until 40L).forall(assigned(_) != clusterOfFirst))
  }

  test("topK with nprobe=1 matches brute force for an in-cluster query") {
    val m = Ivf.train(vecs, "vec_id", "embedding", k = 2)
    val q = Array(10.0, 0.0)
    val ivf = Ivf.topK(vecs, "vec_id", "embedding", m, q, k = 5, nprobe = 1)
      .select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf == brute)
  }
}
