package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** In-engine logistic-GD quality scorer: learning signal, determinism,
  * and the fixed-point contracts the SQL replay depends on. */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // separable toy corpus: label = f1 > 0.5
  private def toy(n: Int) = (1 to n).map { i =>
    val f1 = (i % 100) / 100.0
    (i.toLong, 1.0, f1, if (f1 > 0.5) 1.0 else 0.0)
  }.toDF("id", "f0", "f1", "y")

  test("training separates the separable: accuracy beats the 0-model") {
    val df = toy(1000).localCheckpoint()
    val feats = Seq(col("f0"), col("f1"))
    val wq = QualityModel.train(df, feats, col("y"), iters = 10, lrNum = 8L)
    val scored = df.withColumn("p", QualityModel.score(feats, wq))
    val acc = scored.filter((col("p") >= 0.5) === (col("y") === 1.0))
      .count().toDouble / 1000.0
    assert(acc > 0.8, s"accuracy $acc with weights $wq")
    df.unpersist()
  }

  test("weights are partitioning-invariant (exact integer gradients)") {
    val feats = Seq(col("f0"), col("f1"))
    val a = QualityModel.train(toy(500).repartition(1), feats, col("y"))
    val b = QualityModel.train(toy(500).repartition(13), feats, col("y"))
    assert(a == b)
  }

  test("fast sigmoid is bounded and monotone") {
    val zs = Seq(-100.0, -1.0, 0.0, 1.0, 100.0).toDF("z")
    val ps = zs.select(QualityModel.fastSigmoid(col("z")))
      .as[Double].collect().toSeq
    assert(ps == ps.sorted)
    assert(ps.forall(p => p > 0.0 && p < 1.0))
    assert(ps(2) == 0.5)
  }

  test("scaled-long update truncates toward zero like DuckDB //") {
    // the contract trainCtes encodes: Scala Long./ == DuckDB //
    assert(-7L / 2L == -3L && 7L / 2L == 3L)
  }

  test("empty corpus refuses to train") {
    intercept[IllegalArgumentException] {
      QualityModel.train(toy(0), Seq(col("f0")), col("y"))
    }
  }
}
