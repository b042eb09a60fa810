package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication over embeddings (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540): k-means-partition the embedding
  * space into cells, then search for near-duplicate pairs WITHIN each
  * cell only. Complements the hyperplane-LSH path
  * ([[Similarity.cosineDupPairs]]): LSH bands bound the candidate set
  * probabilistically, SemDeDup bounds it geometrically — and the cell id
  * doubles as a curriculum/diversity key for downstream sampling.
  *
  * Scale design: the only shuffle is the equi-join on the cell id, so the
  * all-pairs blowup is confined to within-cell candidate sets. At corpus
  * scale `k` grows with the corpus (k ≈ n / targetCellSize, the paper runs
  * 50k cells for LAION) keeping per-cell work bounded; a skewed (giant)
  * cell is recursively re-clustered by [[Ivf.assignBounded]] — pass
  * `maxCellSize` to [[pairs]]/[[keep]] to enforce the budget. Centroids
  * are a k×dim driver-side artifact embedded as literals ([[Ivf.Model]])
  * — assignment is a narrow codegen'd projection, not a join.
  *
  * Determinism: training ([[Ivf.train]]) is md5-seeded with exact-DECIMAL
  * means, and the verify cosine accumulates left-to-right in double — so
  * an external SQL engine replays cells AND pairs bit-for-bit (the
  * q_x_semdedup oracle does, end to end).
  */
object SemDedup {

  /** Near-duplicate pairs (id_a < id_b) with their cell id: exact cosine
    * within k-means cells. Norms are computed once per row before the
    * join, so each candidate pair costs one codegen'd dot product.
    *
    * `maxCellSize`: the within-cell join is quadratic in the largest
    * cell; a budget routes assignment through [[Ivf.assignBounded]] so a
    * pathological dense cell is recursively split before the join (the
    * standard skewed-key defense, applied geometrically). */
  def pairs(df: DataFrame, idCol: String, vecCol: String, model: Ivf.Model,
      threshold: Double, maxCellSize: Option[Long] = None): DataFrame = {
    // materialize the assigned frame ONCE: the self-join references it
    // on both sides and the executed plan shares nothing between them
    // (measured on q_x_keep_best: the k×dim assignment projection and
    // the upstream scan/join ran per side — 15 scans per run), so
    // without the seam every row pays the k-centroid distance array
    // twice. The checkpoint is (id, vec, nrm, cell) — the same O(corpus
    // embeddings) frame SemDeDup materializes as its cell index at
    // deployment scale.
    val a = maxCellSize
      .map(b => Ivf.assignBounded(df, idCol, vecCol, model, b))
      .getOrElse(Ivf.assign(df, vecCol, model))
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        sqrt(Similarity.dot(col(vecCol), col(vecCol))).as("nrm"),
        col("__cluster").as("cell"))
      .localCheckpoint()
    graft.core.Metrics.deferUnpersist(a)
    a.as("a").join(a.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.cell").cast("long").as("cell"),
        when(col("a.nrm") * col("b.nrm") > 0,
          Similarity.dot(col("a.vec"), col("b.vec")) /
            (col("a.nrm") * col("b.nrm")))
          .otherwise(lit(0.0)).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }

  /** Keep-one projection: drops every row that near-duplicates a
    * smaller-id row in its cell (the greedy min-id keep rule — one
    * deterministic representative per duplicate chain; the paper keeps a
    * random member, which is not replayable).
    *
    * The anti-join is deliberately NOT hint-forced: the drop set is
    * usually a small fraction of the corpus (broadcast is right), but a
    * high-dup crawl (30–60% dups is realistic for web text) would make a
    * FORCED broadcast a driver/executor OOM. The size gate is AQE's
    * runtime re-plan — it sees the drop set's EXACT post-shuffle size and
    * converts to a broadcast join only under the byte threshold, which
    * beats any driver-side row count: no extra job, no eager execution at
    * plan-construction time, and bytes (what OOMs) rather than rows. */
  def keep(df: DataFrame, idCol: String, vecCol: String, model: Ivf.Model,
      threshold: Double, maxCellSize: Option[Long] = None): DataFrame = {
    val drop = pairs(df, idCol, vecCol, model, threshold, maxCellSize)
      .select(col("id_b").as("__drop")).distinct()
    df.join(drop, col(idCol) === col("__drop"), "left_anti")
  }

  /** Quality-aware keep: drops every row that near-duplicates a BETTER
    * row — `scoreCol` descending, ties to the smaller id. The curation
    * refinement of [[keep]]'s min-id rule: when a duplicate cluster
    * holds a long clean document and its truncated mirror, min-id keeps
    * whichever crawled first; this keeps the better one. A row survives
    * iff it loses to no neighbor: for each near-dup pair the loser is
    * the lower-scored side (equal scores → the larger id), exactly the
    * pairwise rule an SQL oracle replays. A NULL score ranks BELOW every
    * real score (SQL NULLS-last descending): the null-scored side loses,
    * and a both-NULL pair falls back to the min-id tie rule — without the
    * explicit branches both `when`s would be null and the otherwise would
    * silently drop `id_b` even when `id_b` holds the only real score.
    * Same plan shape as [[keep]]: within-cell pairs → drop-set distinct →
    * AQE-planned anti-join. */
  def keepBest(df: DataFrame, idCol: String, vecCol: String,
      scoreCol: String, model: Ivf.Model, threshold: Double,
      maxCellSize: Option[Long] = None): DataFrame = {
    val p = pairs(df, idCol, vecCol, model, threshold, maxCellSize)
    val scores = df.select(col(idCol), col(scoreCol))
    val drop = p
      .join(scores.select(col(idCol).as("id_a"),
        col(scoreCol).as("__sa")), Seq("id_a"))
      .join(scores.select(col(idCol).as("id_b"),
        col(scoreCol).as("__sb")), Seq("id_b"))
      .select(when(col("__sb").isNull && col("__sa").isNotNull, col("id_b"))
        .when(col("__sa").isNull && col("__sb").isNotNull, col("id_a"))
        .when(col("__sa") > col("__sb"), col("id_b"))
        .when(col("__sb") > col("__sa"), col("id_a"))
        .otherwise(col("id_b")).as("__drop")) // tie: id_a < id_b keeps a
      .distinct()
    df.join(drop, col(idCol) === col("__drop"), "left_anti")
  }

  /** Ingest-time SemDeDup: near-dup pairs between a micro-BATCH and the
    * INDEXED corpus (the [[Ivf.index]] layout — stored vectors in
    * `cell=<i>` partition directories, centroid sidecar). The batch
    * assigns against the STORED model (a pure projection, no training),
    * and the corpus side is a partition-PRUNED scan of only the batch's
    * cells — at 100 TB the scan touches |batch cells|/k of the index
    * while the batch side broadcasts (the [[Ivf.probeMany]] routing
    * move). Collecting the batch's distinct cells is a bounded driver
    * artifact (≤ k ints), same class as the centroid literals.
    *
    * Returns (id, dup_of, cell, cosine_sim): every corpus row a batch
    * row semantically duplicates — feed `id`s to a drop/route decision,
    * then [[graft.ops.Ivf.indexAppend]] the survivors to advance the
    * corpus. */
  def incrementalAgainstIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, batch: DataFrame, idCol: String, vecCol: String,
      threshold: Double, modelOpt: Option[Ivf.Model] = None,
      cellsOpt: Option[Seq[Int]] = None): DataFrame = {
    // a caller holding the model (e.g. a resident stream doing several
    // stages per trigger) passes it — and optionally the batch's cell
    // set — to skip the per-call sidecar read and the cells-collect job
    val model = modelOpt.getOrElse(Ivf.loadModel(spark, indexPath))
    val b = Ivf.assign(batch, vecCol, model)
      .select(col(idCol).as("__bid"), col(vecCol).as("__bvec"),
        sqrt(Similarity.dot(col(vecCol), col(vecCol))).as("__bnrm"),
        col("__cluster").as("__bcell"))
    val cells = cellsOpt.getOrElse(b.select("__bcell").distinct().collect()
      .map(_.getInt(0)).toSeq)
    val corpus = spark.read.parquet(indexPath)
      .filter(col(Ivf.CellCol).isin(cells: _*))
      .select(col(idCol).as("__cid"), col(vecCol).as("__cvec"),
        sqrt(Similarity.dot(col(vecCol), col(vecCol))).as("__cnrm"),
        col(Ivf.CellCol).as("__ccell"))
    corpus.join(broadcast(b),
        col("__ccell") === col("__bcell") && col("__cid") =!= col("__bid"))
      .select(col("__bid").as("id"), col("__cid").as("dup_of"),
        col("__bcell").cast("long").as("cell"),
        when(col("__bnrm") * col("__cnrm") > 0,
          Similarity.dot(col("__bvec"), col("__cvec")) /
            (col("__bnrm") * col("__cnrm")))
          .otherwise(lit(0.0)).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }

  /** Cell-balanced deterministic sample: at most `perCell` rows per
    * k-means cell, chosen by md5-order within the cell (replayable by any
    * SQL engine — no rand()). The diversity-preserving counterpart of
    * uniform sampling for training-data curation: rare semantic regions
    * keep representation instead of being washed out by dense ones.
    * One window over the cell partition — a single key shuffle. */
  def cellSample(df: DataFrame, idCol: String, vecCol: String,
      model: Ivf.Model, perCell: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__cluster"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    Ivf.assign(df, vecCol, model)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perCell)
      .select(col(idCol), col("__cluster").cast("long").as("cell"))
  }
}
