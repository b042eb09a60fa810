package graft.tools

import graft.ops.{Ivf, Pq}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (BENCHNOTES discipline): where does an in-query ANN
  * training pipeline spend its wall? Times each phase of the
  * q_x_ann_pq / q_x_knn_graph shape separately — seed collect, Lloyd
  * passes, the serving scan — so the optimization target is measured,
  * not guessed. Not part of the driver contract. */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(fn: => T): T = {
      val t0 = System.nanoTime(); val r = fn
      println(f"[trainprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val emb = graft.Tables.read(spark, sfDir, "embeddings")
    println(s"[trainprobe] rows=${emb.count()}")
    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      val q = time("head(query vec)") {
        emb.filter(col("vec_id") === 0).select(col("embedding"))
          .head().getSeq[Float](0).map(_.toDouble).toArray
      }
      val model = time("Ivf.train k=8 iters=2") {
        Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
      }
      time("Ivf.assign scan (noop)") {
        Ivf.assign(emb, "embedding", model)
          .write.format("noop").mode("overwrite").save()
      }
      val cb = time("Pq.train m=4 dsub=16 k=8 iters=2") {
        Pq.train(emb, "vec_id", "embedding", m = 4, dsub = 16, k = 8,
          iters = 2)
      }
      time("Pq.adcTopK scan") {
        Pq.adcTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
            cb, q, topK = 20)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
