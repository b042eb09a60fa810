package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"): split each vector into `m` subvectors,
  * k-means each subspace independently, and store only the `m` one-byte
  * code ids — a 64-dim float vector becomes `m` bytes (32× compression
  * at m=8), which is what makes 100 TB of embeddings searchable: the
  * compressed corpus fits where the raw vectors never will, and query
  * distance is a table lookup per subspace instead of a d-dim dot
  * product (ADC — asymmetric distance computation).
  *
  * Scale design: training is `m` independent [[Ivf.train]] runs over
  * sliced columns (driver holds m×k×dsub doubles); encoding is a pure
  * projection (the m assignment expressions — no joins, no shuffle);
  * ADC search materializes the m×k lookup table as literals, so the
  * whole scan is one codegen'd projection + TakeOrdered. At cluster
  * scale PQ composes with IVF (IVF-PQ: route by cell, re-rank by ADC).
  *
  * Deterministic throughout, same discipline as [[Ivf]]: md5-ordered
  * seeds and DECIMAL-exact means per subspace — the q_x_ann_pq oracle
  * replays training, encoding AND the ADC scores bit-for-bit in DuckDB.
  */
object Pq {

  /** Per-subspace codebooks; `books(j).centroids` is k × dsub. */
  final case class Codebooks(dsub: Int, books: Array[Ivf.Model]) {
    def m: Int = books.length
    def k: Int = books.head.k
  }

  private def sub(vecCol: String, j: Int, dsub: Int) =
    slice(col(vecCol), j * dsub + 1, dsub)

  /** Train m independent subspace codebooks. `m * dsub` must cover the
    * vector length; every subspace sees the SAME md5-ordered seed rows
    * (sliced), so an external engine replays each codebook. */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int,
      dsub: Int, k: Int, iters: Int = 2): Codebooks = {
    require(m >= 1 && dsub >= 1 && k >= 1, s"bad m=$m dsub=$dsub k=$k")
    Codebooks(dsub, (0 until m).map { j =>
      Ivf.train(
        df.select(col(idCol).as("__pqid"),
          sub(vecCol, j, dsub).as("__sub")),
        "__pqid", "__sub", k, iters)
    }.toArray)
  }

  /** Adds `__code0..__code{m-1}` (int in [0,k)) — the compressed form.
    * A pure m-expression projection: no joins, no shuffle, codegen'd. */
  def encode(df: DataFrame, vecCol: String, cb: Codebooks): DataFrame =
    (0 until cb.m).foldLeft(df) { (cur, j) =>
      Ivf.assign(cur.withColumn("__sub", sub(vecCol, j, cb.dsub)),
          "__sub", cb.books(j))
        .withColumnRenamed("__cluster", s"__code$j")
        .drop("__sub")
    }

  /** ADC top-k: estimated ‖q−x‖² = Σ_j lut_j(code_j), where lut_j holds
    * the exact squared distances from the query's j-th subvector to the
    * k codewords (an m×k driver-side table embedded as literals). The
    * scan is one projection + TakeOrdered — no joins. Ascending distance,
    * ties on the id; `est_d2` is rounded for output, ordering uses the
    * full double. */
  def adcTopK(df: DataFrame, idCol: String, vecCol: String, cb: Codebooks,
      query: Array[Double], topK: Int): DataFrame = {
    val luts = (0 until cb.m).map { j =>
      val qj = query.slice(j * cb.dsub, (j + 1) * cb.dsub)
      cb.books(j).centroids.map(c => Ivf.dist2(qj, c)).toSeq
    }
    val est = (0 until cb.m)
      .map(j => element_at(typedlit(luts(j)), col(s"__code$j") + 1))
      .reduce(_ + _) // left-assoc — the oracle adds in the same order
    encode(df, vecCol, cb)
      .select(col(idCol), est.as("__est"))
      .orderBy(col("__est"), col(idCol)).limit(topK)
      .select(col(idCol), round(col("__est"), 6).as("est_d2"))
  }

  /** IVF-PQ: route by coarse cell ([[Ivf]]), ADC-rank inside the probed
    * cells only — the canonical production ANN shape (a query touches
    * nprobe/k of the corpus AND each touched vector costs m lookups
    * instead of a d-dim product). At 100 TB the cell id is a partition
    * column, so the probe is partition pruning; the ADC scan stays a
    * pure projection. */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, cb: Codebooks, query: Array[Double], topK: Int,
      nprobe: Int = 2): DataFrame = {
    val probes = coarse.nearest(query, nprobe)
    val routed = Ivf.assign(df, vecCol, coarse)
      .filter(col("__cluster").isin(probes: _*))
      .drop("__cluster")
    adcTopK(routed, idCol, vecCol, cb, query, topK)
  }
}
