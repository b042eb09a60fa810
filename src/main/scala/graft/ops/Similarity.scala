package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a single scan with a per-row dot
  * product (codegen'd `zip_with`/`aggregate`, computed in double) and a
  * distributed TakeOrderedAndProject (`orderBy.limit`), i.e. per-partition
  * heaps + driver merge of k rows, never a full sort.
  *
  * Scale path: random-hyperplane LSH — each vector hashes to a small
  * signature; a query probes only its bucket(s). Hyperplanes are
  * deterministic (seeded splitmix) so signatures are reproducible across
  * runs and executors.
  */
object Similarity {

  /** Sum of element-wise products in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  private def vecLit(v: Array[Double]): Column =
    array(v.map(x => lit(x)): _*)

  /** Brute-force top-k by cosine against a fixed query vector.
    * Deterministic tie-break on id ascending. */
  def bruteForceTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame =
    df.select(col(idCol),
        cosine(col(vecCol), vecLit(query)).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)

  /** Random-hyperplane signature: bit i = sign(v · h_i), packed into a
    * long. Hyperplane components are deterministic xxhash64(plane, dim)
    * values mapped to [-1, 1] — identical on every executor and every run.
    * Per-row expression, no shuffle. */
  def hyperplaneSignature(vec: Column, numPlanes: Int): Column =
    (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast(DoubleType) *
            (xxhash64(lit(p), i).cast(DoubleType) / Long.MaxValue.toDouble)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed ANN: candidates share the query's signature bucket (or
    * differ in <= probeBits bits), then exact cosine re-rank of the
    * candidate set only. At 100 TB the bucket column is a partition key —
    * the probe touches a tiny fraction of data. */
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int,
      numPlanes: Int = 16, probeBits: Int = 2): DataFrame = {
    val sigCol = hyperplaneSignature(col(vecCol), numPlanes)
    val querySig = hyperplaneSignature(vecLit(query), numPlanes)
    val candidates = df
      .withColumn("__sig", sigCol)
      .withColumn("__qsig", querySig)
      .filter(bit_count(col("__sig").bitwiseXOR(col("__qsig"))) <= probeBits)
    bruteForceTopK(candidates.drop("__sig", "__qsig"), idCol, vecCol, query, k)
  }

  /** Embedding-cosine near-duplicate pairs via shared LSH bucket + exact
    * cosine verify. One equi-join on the signature — no all-pairs. */
  def cosineDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 12): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      hyperplaneSignature(col(vecCol), numPlanes).as("sig"))
    sigs.as("a").join(sigs.as("b"),
        col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.vec"), col("b.vec")).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }
}
