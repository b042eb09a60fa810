package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Ivf, Similarity}

/** Measures the filtered-ANN widening rule: recall@k of
  * [[Ivf.probeFiltered]] (top-k under a ~10%-selective label predicate)
  * against the filtered brute-force ground truth, as nprobe widens —
  * the evidence row behind probeFiltered's scaladoc rule that a
  * selectivity-s predicate wants the probe width scaled by ~1/s.
  *
  * Prints one markdown row per nprobe: nprobe, mean candidates after
  * the filter, recall@k over nq query vectors.
  */
object FilteredRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 10
    val nq = if (args.length > 2) args(2).toInt else 20
    val label = 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.Tables.read(spark, sfDir, "embeddings").cache()
    val n = emb.count()
    val nLabel = emb.filter(col("label") === label).count()
    val idx = graft.IndexStore.annIvf(spark, sfDir)

    // query set: a deterministic spread of corpus vectors
    val stride = math.max(1L, n / nq)
    val queries = emb.filter(col("vec_id") % stride === 0)
      .orderBy("vec_id").limit(nq)
      .select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)

    // filtered brute-force ground truth per query
    val truth = queries.map { case (qid, q) =>
      qid -> Similarity.bruteForceTopK(
          emb.filter(col("label") === label && col("vec_id") =!= qid),
          "vec_id", "embedding", q, k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap

    println(s"corpus=$n label=$label rows=$nLabel " +
      f"selectivity=${nLabel.toDouble / n}%.3f k=$k nq=${queries.length}")
    println("| nprobe | mean candidates | recall@" + k + " |")
    println("|---|---|---|")
    for (nprobe <- Seq(1, 2, 4, 8)) {
      var cand = 0L
      val recalls = queries.map { case (qid, q) =>
        val res = Ivf.probeFiltered(spark, idx.path, "vec_id",
            "embedding", q, k + 1, col("label") === label, nprobe)
          .filter(col("vec_id") =!= qid).limit(k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        cand += spark.read.parquet(idx.path)
          .filter(col("cell").isin(
            Ivf.loadModel(spark, idx.path).nearest(q, nprobe): _*))
          .filter(col("label") === label).count()
        res.intersect(truth(qid)).size.toDouble / k
      }
      val recall = recalls.sum / recalls.length
      println(f"| $nprobe | ${cand.toDouble / queries.length}%.1f " +
        f"| $recall%.3f |")
    }
    spark.stop()
  }
}
