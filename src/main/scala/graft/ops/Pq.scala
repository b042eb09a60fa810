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
  *
  * SERVING GUIDANCE (measured, RECALL.md): ADC-only ranking is capped
  * by the code quantization itself — recall@10 ≈ 0.2 at m=4 even with
  * a full scan — so [[adcTopK]] / [[ivfPqTopK]] / [[probeIndexed]] /
  * [[probeManyIndexed]] are SHORTLIST PRIMITIVES, not serving
  * endpoints. Serve the `*Refined` forms: the exact re-rank over a
  * shortlist=100 lifts recall to 0.65–0.89 for one O(shortlist)
  * vector fetch per query, and is the default operating point this
  * module recommends.
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
    * (sliced), so an external engine replays each codebook.
    *
    * All m subspaces train TOGETHER: one seed collect, then per Lloyd
    * iteration a single aggregation job computes every (subspace, code,
    * position) mean — the equivalent of m independent [[Ivf.train]] runs
    * costs ~3·m serialized driver jobs; this costs iters+1. The math is
    * identical (same assignments, same DECIMAL-exact means), so the
    * oracle replay is unchanged. */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int,
      dsub: Int, k: Int, iters: Int = 2): Codebooks = {
    require(m >= 1 && dsub >= 1 && k >= 1, s"bad m=$m dsub=$dsub k=$k")
    // one collect: the k md5-smallest rows' full vectors (the SAME shared
    // seed rule Ivf.train uses), sliced on the driver — identical to
    // per-subspace selection (slicing doesn't change the md5(id) order)
    val seeds = Ivf.seedRows(df, idCol, vecCol, k)
    var books = (0 until m).map(j =>
      Ivf.Model(seeds.map(_.slice(j * dsub, (j + 1) * dsub)))).toArray
    for (_ <- 1 to iters) {
      val encoded = (0 until m).foldLeft(df.select(col(vecCol).as("__v"))) {
        (cur, j) =>
          Ivf.assign(cur.withColumn("__sub", sub("__v", j, dsub)),
              "__sub", books(j))
            .withColumnRenamed("__cluster", s"__c$j").drop("__sub")
      }
      val codes = array((0 until m).map(j => col(s"__c$j")): _*)
      val rows = encoded
        .select(codes.as("__codes"),
          posexplode(col("__v")).as(Seq("__pos", "__x")))
        .filter(col("__pos") < m * dsub) // extra dims train no codebook
        .select(expr(s"__pos div $dsub").cast("int").as("__j"),
          pmod(col("__pos"), lit(dsub)).as("__p"), col("__codes"), col("__x"))
        .select(col("__j"),
          element_at(col("__codes"), col("__j") + 1).as("__code"),
          col("__p"), col("__x"))
        .groupBy("__j", "__code", "__p")
        .agg((sum(col("__x").cast("decimal(27,12)")).cast("double") /
          count(lit(1))).as("__m"))
        .collect()
      val byJ = rows.groupBy(_.getInt(0))
      books = books.zipWithIndex.map { case (b, j) =>
        val means = byJ.getOrElse(j, Array.empty[org.apache.spark.sql.Row])
          .groupBy(_.getInt(1))
          .map { case (c, rs) =>
            c -> rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray
          }
        // empty codes keep their previous centroid (Ivf.train rule)
        Ivf.Model(b.centroids.zipWithIndex.map { case (c, i) =>
          means.getOrElse(i, c)
        })
      }
    }
    Codebooks(dsub, books)
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
    * full double.
    *
    * Shortlist primitive (recall ~0.2 standalone — see the object doc);
    * serve [[adcRefineTopK]]. */
  def adcTopK(df: DataFrame, idCol: String, vecCol: String, cb: Codebooks,
      query: Array[Double], topK: Int): DataFrame =
    adcRank(encode(df, vecCol, cb), idCol, cb, query, topK)

  /** The ADC estimate as a column over existing `__code0..m-1` columns —
    * shared by the encode-at-query-time path ([[adcTopK]]) and the
    * stored-codes path ([[probeIndexed]]), so both rank by the exact same
    * left-to-right lookup sum. */
  private def adcEst(cb: Codebooks, query: Array[Double]): org.apache.spark.sql.Column = {
    val luts = (0 until cb.m).map { j =>
      val qj = query.slice(j * cb.dsub, (j + 1) * cb.dsub)
      cb.books(j).centroids.map(c => Ivf.dist2(qj, c)).toSeq
    }
    (0 until cb.m)
      .map(j => element_at(typedlit(luts(j)), col(s"__code$j") + 1))
      .reduce(_ + _) // left-assoc — the oracle adds in the same order
  }

  private def adcRank(coded: DataFrame, idCol: String, cb: Codebooks,
      query: Array[Double], topK: Int): DataFrame =
    coded.select(col(idCol), adcEst(cb, query).as("__est"))
      .orderBy(col("__est"), col(idCol)).limit(topK)
      .select(col(idCol), round(col("__est"), 6).as("est_d2"))

  /** Two-stage search — ADC shortlist, then EXACT re-rank: the standard
    * recall fix for coarse codebooks (Jégou et al. §V "IVFADC with
    * re-ranking"). Stage 1 scans compressed codes and keeps `shortlist`
    * candidates (cheap everywhere); stage 2 fetches full vectors for
    * ONLY those rows (a broadcast semi-join — at corpus scale this is a
    * point-lookup join against the vector store) and ranks them by exact
    * cosine. Measured on the test embeddings (tools.AnnRecall, m=4
    * codebooks over uniform vectors — a hard case for coarse codes):
    * recall@10 0.205 pure ADC → 0.650 with shortlist=10·k; raise the
    * shortlist (exact work stays O(shortlist), not O(corpus)) or m to
    * climb further. */
  /** The shared exact-refine tail every two-stage search composes onto
    * its shortlist: fetch full vectors for ONLY the shortlist ids (a
    * broadcast semi-join — at corpus scale a point-lookup join against
    * the vector store) and rank them by exact cosine. */
  private def refineExact(vectors: DataFrame, idCol: String,
      vecCol: String, cand: DataFrame, query: Array[Double],
      topK: Int, shortlist: Int): DataFrame = {
    require(shortlist >= topK, s"shortlist=$shortlist must cover topK=$topK")
    Similarity.bruteForceTopK(
      vectors.join(
        org.apache.spark.sql.functions.broadcast(cand.select(col(idCol))),
        Seq(idCol), "left_semi"),
      idCol, vecCol, query, topK)
  }

  def adcRefineTopK(df: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks, query: Array[Double], topK: Int,
      shortlist: Int): DataFrame =
    refineExact(df, idCol, vecCol,
      adcTopK(df, idCol, vecCol, cb, query, shortlist), query, topK,
      shortlist)

  /** IVF-PQ: route by coarse cell ([[Ivf]]), ADC-rank inside the probed
    * cells only — the canonical production ANN shape (a query touches
    * nprobe/k of the corpus AND each touched vector costs m lookups
    * instead of a d-dim product). At 100 TB the cell id is a partition
    * column, so the probe is partition pruning; the ADC scan stays a
    * pure projection.
    *
    * Shortlist primitive (recall 0.235 standalone at nprobe=2 — see the
    * object doc); serve [[ivfPqRefineTopK]]. */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, cb: Codebooks, query: Array[Double], topK: Int,
      nprobe: Int = 2): DataFrame = {
    val probes = coarse.nearest(query, nprobe)
    val routed = Ivf.assign(df, vecCol, coarse)
      .filter(col("__cluster").isin(probes: _*))
      .drop("__cluster")
    adcTopK(routed, idCol, vecCol, cb, query, topK)
  }

  /** IVF-PQ with exact re-rank (Jégou et al. §V "IVFADC with
    * re-ranking" applied to the routed path): coarse cells bound WHERE
    * we look, the ADC shortlist bounds WHAT we fetch, and the exact
    * stage touches only `shortlist` full vectors — the recall fix
    * [[adcRefineTopK]] proves (RECALL.md 0.205→0.650) composed onto the
    * nprobe/k-of-the-corpus scan. */
  def ivfPqRefineTopK(df: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, cb: Codebooks, query: Array[Double], topK: Int,
      nprobe: Int = 2, shortlist: Int = 100): DataFrame =
    refineExact(df, idCol, vecCol,
      ivfPqTopK(df, idCol, vecCol, coarse, cb, query, shortlist, nprobe),
      query, topK, shortlist)

  // ------------------------------------------------------------------
  // Residual IVF-PQ (IVFADC proper)
  // ------------------------------------------------------------------

  /** vec − centroid[cell]: the residual the paper's IVFADC quantizes.
    * The centroid table rides as ONE k×dim literal; the lookup is
    * element_at by the assigned cell — a pure projection, no join. */
  private def residual(vecCol: org.apache.spark.sql.Column,
      cellCol: org.apache.spark.sql.Column,
      coarse: Ivf.Model): org.apache.spark.sql.Column =
    zip_with(vecCol,
      element_at(typedlit(coarse.centroids.map(_.toSeq).toSeq), cellCol + 1),
      (x, c) => x - c)

  /** Train codebooks on RESIDUALS (Jégou et al. §III-C, the production
    * IVFADC): after coarse routing, every vector is re-expressed
    * relative to its cell center, so the m×k codewords spend their bits
    * on within-cell structure instead of re-describing cell positions.
    * The gain is proportional to how much of the corpus's variance the
    * coarse centroids capture: on the paper's clustered SIFT data it is
    * large; on THIS repo's uniform synthetic embeddings the centroids
    * barely differ and RECALL.md measures parity with raw-vector codes
    * (0.230 vs 0.235) — which is exactly the expected behavior, recorded
    * rather than assumed. Same deterministic discipline throughout. */
  def trainResidual(df: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, m: Int, dsub: Int, k: Int,
      iters: Int = 2): Codebooks = {
    val withRes = Ivf.assign(df, vecCol, coarse)
      .withColumn("__res", residual(col(vecCol), col("__cluster"), coarse))
    train(withRes, idCol, "__res", m, dsub, k, iters)
  }

  /** Residual IVF-PQ search: probe the nprobe nearest cells; inside a
    * probed cell, ADC uses THAT cell's lookup table (distances from the
    * query's residual w.r.t. that cell to the codewords) — an nprobe-arm
    * conditional over per-cell LUT literals, still a pure projection. */
  def ivfPqResidualTopK(df: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, cb: Codebooks, query: Array[Double], topK: Int,
      nprobe: Int = 2): DataFrame = {
    val probes = coarse.nearest(query, nprobe)
    // the coarse cell must survive encoding (each subspace assign inside
    // encode writes-then-renames its own __cluster) — park it as __cell
    val routed = Ivf.assign(df, vecCol, coarse)
      .filter(col("__cluster").isin(probes: _*))
      .withColumnRenamed("__cluster", "__cell")
    val coded = encode(
      routed.withColumn("__res", residual(col(vecCol), col("__cell"), coarse)),
      "__res", cb)
    val est = probes.map { cell =>
      val qres = query.zip(coarse.centroids(cell)).map { case (x, c) => x - c }
      (cell, adcEst(cb, qres))
    }.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (acc, (cell, e)) =>
        val arm = col("__cell") === cell
        Some(acc.fold(when(arm, e))(_.when(arm, e)))
    }.get // probes is non-empty (nearest of a trained model)
    coded.select(col(idCol), est.as("__est"))
      .orderBy(col("__est"), col(idCol)).limit(topK)
      .select(col(idCol), round(col("__est"), 6).as("est_d2"))
  }

  /** Residual IVFADC with exact re-rank — the paper's full two-stage
    * pipeline (coarse route → residual-ADC shortlist → exact distance on
    * the shortlist only). */
  def ivfPqResidualRefineTopK(df: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, cb: Codebooks, query: Array[Double], topK: Int,
      nprobe: Int = 2, shortlist: Int = 100): DataFrame =
    refineExact(df, idCol, vecCol,
      ivfPqResidualTopK(df, idCol, vecCol, coarse, cb, query, shortlist,
        nprobe),
      query, topK, shortlist)

  // ------------------------------------------------------------------
  // Persisted IVF-PQ index: cell-partitioned codes, no raw vectors
  // ------------------------------------------------------------------

  private val PqSidecar = "_graft_pq_codebooks.txt"

  private[ops] def writeCodebooks(spark: org.apache.spark.sql.SparkSession,
      path: String, cb: Codebooks): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(path, PqSidecar), true)
    val body = (s"${cb.m} ${cb.dsub} ${cb.k}" +:
      cb.books.flatMap(_.centroids.map(_.mkString(","))).toSeq)
      .mkString("\n")
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  def loadCodebooks(spark: org.apache.spark.sql.SparkSession,
      path: String): Codebooks = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path, PqSidecar))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toArray finally in.close()
    val Array(m, dsub, k) = lines.head.split(" ").map(_.toInt)
    val cents = lines.tail.map(_.split(",").map(java.lang.Double.parseDouble))
    Codebooks(dsub, Array.tabulate(m)(j =>
      Ivf.Model(cents.slice(j * k, (j + 1) * k))))
  }

  /** Materialize the production IVF-PQ layout: rows routed to coarse
    * cells ([[Ivf.CellCol]] partition directories) carrying ONLY id +
    * the m code columns — the raw vector column is dropped, which IS the
    * compression (a 64-dim float vector persists as m ints; at 100 TB
    * the index is ~1/64th of the corpus bytes). Both models ride as
    * sidecars, so a probe needs no training state. */
  def index(df: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, cb: Codebooks, path: String): Unit = {
    codesByCell(df, idCol, vecCol, coarse, cb)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(Ivf.CellCol).parquet(path)
    Ivf.writeModel(df.sparkSession, path, coarse)
    writeCodebooks(df.sparkSession, path, cb)
  }

  /** Incremental ingest into an existing IVF-PQ index: encode the new
    * batch with the STORED models and append into the cell directories
    * (the [[Ivf.indexAppend]] story, compressed form). */
  def indexAppend(spark: org.apache.spark.sql.SparkSession, path: String,
      df: DataFrame, idCol: String, vecCol: String): Unit =
    codesByCell(df, idCol, vecCol,
      Ivf.loadModel(spark, path), loadCodebooks(spark, path))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy(Ivf.CellCol).parquet(path)

  // id + codes only, clustered by cell pre-write (one writer per cell —
  // see Ivf.clustered for the small-files rationale)
  private def codesByCell(df: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, cb: Codebooks): DataFrame = {
    val routed = Ivf.assign(df, vecCol, coarse)
      .withColumnRenamed("__cluster", Ivf.CellCol)
    encode(routed, vecCol, cb)
      .select((idCol +: Ivf.CellCol +:
        (0 until cb.m).map(j => s"__code$j")).map(col): _*)
      .repartition(col(Ivf.CellCol))
  }

  /** Partition-pruned ADC top-k over an [[index]]ed corpus. Results are
    * IDENTICAL to [[ivfPqTopK]] with the same models/query/nprobe (stored
    * codes = re-encoded codes; encoding is deterministic) — but the scan
    * opens only the probed cell directories and reads m code ints per
    * row, never a vector.
    *
    * Shortlist primitive (see the object doc); serve
    * [[probeIndexedRefined]] — same pruned scan + an O(shortlist)
    * exact re-rank, measured 0.235 → 0.665 recall@10. */
  def probeIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, query: Array[Double], topK: Int,
      nprobe: Int = 2): DataFrame = {
    val coarse = Ivf.loadModel(spark, path)
    val cb = loadCodebooks(spark, path)
    val probes = coarse.nearest(query, nprobe)
    val pruned = spark.read.parquet(path)
      .filter(col(Ivf.CellCol).isin(probes: _*))
    adcRank(pruned, idCol, cb, query, topK)
  }

  /** Above this batch size the per-query ADC lookup tables travel as
    * broadcast-join DATA instead of one `typedlit` map literal: the
    * literal is faster for a serving-sized batch (one projection, no
    * second join input), but its plan grows O(|queries|·m·k) doubles and
    * a 10⁴–10⁵-query offline scoring batch would hit Catalyst
    * literal/codegen limits. The join form's plan is O(1) in batch size
    * (a LocalRelation carries the rows; nothing lands in the expression
    * tree). */
  val LutLiteralMaxQueries = 32

  /** Batched serving over a [[index]]ed corpus — the [[Ivf.probeMany]]
    * story in compressed form: ONE pruned scan (union of every query's
    * probed cells) serves the whole query batch. The routing table
    * broadcasts; each query's m×k ADC lookup table rides either in a
    * single map literal keyed by query id (small batches — pure
    * projection, no per-query jobs) or as a column of the broadcast
    * routing table itself (large batches — plan size stays O(1), see
    * [[LutLiteralMaxQueries]]). Both forms compute identical estimates —
    * same LUT doubles, same left-to-right add order as [[probeIndexed]].
    *
    * Shortlist primitive (see the object doc); serve
    * [[probeManyIndexedRefined]] — measured 0.069 → 0.804 recall@10 on
    * the 200-query clustered batch. */
  def probeManyIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, queries: Seq[(Long, Array[Double])],
      topK: Int, nprobe: Int = 2,
      lutLiteralMax: Int = LutLiteralMaxQueries): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val coarse = Ivf.loadModel(spark, path)
    val cb = loadCodebooks(spark, path)
    val routePairs = queries.map { case (qid, q) =>
      qid -> coarse.nearest(q, nprobe)
    }
    val cells = routePairs.flatMap(_._2).distinct
    // flattened per-query LUT: slot j*k + code holds lut_j(code)
    val luts: Map[Long, Seq[Double]] = queries.map { case (qid, q) =>
      qid -> (0 until cb.m).flatMap { j =>
        val qj = q.slice(j * cb.dsub, (j + 1) * cb.dsub)
        cb.books(j).centroids.map(c => Ivf.dist2(qj, c)).toSeq
      }
    }.toMap
    val useLiteral = queries.size <= lutLiteralMax
    val routes =
      if (useLiteral) routePairs
        .flatMap { case (qid, cs) => cs.map(c => (qid, c)) }
        .toDF("query_id", "__qcell")
      else routePairs // LUT as broadcast data: duplicated nprobe× per
        // query (m·k doubles each), still far smaller than a second join
        .flatMap { case (qid, cs) => cs.map(c => (qid, c, luts(qid))) }
        .toDF("query_id", "__qcell", "__lut")
    val lutRef =
      if (useLiteral) element_at(typedlit(luts), col("query_id"))
      else col("__lut")
    val pruned = spark.read.parquet(path)
      .filter(col(Ivf.CellCol).isin(cells: _*))
    val est = (0 until cb.m)
      .map(j => element_at(lutRef, lit(j * cb.k) + col(s"__code$j") + 1))
      .reduce(_ + _) // left-assoc — matches adcEst's add order
    val scored = pruned
      .join(broadcast(routes), col(Ivf.CellCol) === col("__qcell"))
      .select(col("query_id"), col(idCol), est.as("__est"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__est"), col(idCol))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topK)
      .select(col("query_id"), col(idCol),
        round(col("__est"), 6).as("est_d2"))
  }

  /** Batched two-stage serving: [[probeManyIndexed]] shortlists the
    * WHOLE query batch in one pruned scan, then one exact pass re-ranks
    * every (query, candidate) pair — vectors are fetched for only the
    * shortlisted ids (broadcast join; at corpus scale point lookups
    * against a bucketed vector store), each scored against its query's
    * vector riding the same broadcast. Per query, ranking equals
    * [[probeIndexedRefined]] exactly (same shortlist, same cosine, same
    * tie-break). Batch cost: one pruned code scan + one O(|batch| ·
    * shortlist) re-rank — no per-query jobs anywhere. */
  def probeManyIndexedRefined(spark: org.apache.spark.sql.SparkSession,
      path: String, vectors: DataFrame, idCol: String, vecCol: String,
      queries: Seq[(Long, Array[Double])], topK: Int, nprobe: Int = 2,
      shortlist: Int = 100,
      lutLiteralMax: Int = LutLiteralMaxQueries): DataFrame = {
    require(shortlist >= topK, s"shortlist=$shortlist must cover topK=$topK")
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val cand = probeManyIndexed(spark, path, idCol, queries, shortlist,
      nprobe, lutLiteralMax).select(col("query_id"), col(idCol))
    val qv = queries.map { case (qid, q) => (qid, q.toSeq) }
      .toDF("query_id", "__qvec")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
    vectors.join(broadcast(cand), Seq(idCol))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine_sim",
        Similarity.cosine(col(vecCol), col("__qvec")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topK)
      .select(col("query_id"), col(idCol), col("cosine_sim"))
  }

  /** Served-index two-stage search: the stored-codes shortlist (a pruned
    * scan reading m ints per row) followed by an exact re-rank that
    * fetches full vectors for ONLY the shortlist ids from `vectors` —
    * the id→vector store the codes-only index deliberately doesn't
    * carry. At corpus scale that fetch is a broadcast semi-join against
    * a bucketed vector table (point lookups), so the exact stage stays
    * O(shortlist) while the index keeps its 32× compression. */
  def probeIndexedRefined(spark: org.apache.spark.sql.SparkSession,
      path: String, vectors: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], topK: Int, nprobe: Int = 2,
      shortlist: Int = 100): DataFrame =
    refineExact(vectors, idCol, vecCol,
      probeIndexed(spark, path, idCol, query, shortlist, nprobe),
      query, topK, shortlist)

  // ---- SQ8 scalar quantization ----------------------------------------

  /** Per-dimension uint8 quantization model: 4× compression at one
    * arithmetic op per dimension (vs PQ's 32× at one table lookup per
    * subspace) — the FAISS `SQ8` point on the compression/recall curve,
    * the usual first stop before PQ because its reconstruction error is
    * per-dimension-bounded and needs no codebook training. `scales` is
    * (max−min)/255 per dimension; a constant dimension scales to 0 and
    * encodes as code 0. */
  final case class Sq8Model(mins: Array[Double], scales: Array[Double]) {
    def dim: Int = mins.length
  }

  /** One aggregation pass: per-dimension min/max (driver artifact,
    * 2×dim doubles — the centroid-literal class). */
  def sq8Train(df: DataFrame, vecCol: String): Sq8Model = {
    // take(1), not head(): head() on an empty frame throws
    // NoSuchElementException before any intent-bearing message can fire
    val first = df.select(size(col(vecCol))).take(1)
    require(first.nonEmpty, "sq8Train needs a non-empty corpus")
    val dim = first(0).getInt(0)
    val aggs = (0 until dim).flatMap(j => Seq(
      min(element_at(col(vecCol), j + 1).cast("double")).as(s"mn$j"),
      max(element_at(col(vecCol), j + 1).cast("double")).as(s"mx$j")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    require(!r.isNullAt(0), "sq8Train needs a non-empty corpus")
    val mins = Array.tabulate(dim)(j => r.getDouble(2 * j))
    val scales = Array.tabulate(dim)(j =>
      (r.getDouble(2 * j + 1) - r.getDouble(2 * j)) / 255.0)
    Sq8Model(mins, scales)
  }

  /** Encode vectors to uint8 codes — a pure projection (two-arg
    * `transform` with the model as literal arrays): code_j =
    * ⌊(v_j − min_j)/scale_j + 0.5⌋ clamped to [0, 255] (floor(x+0.5),
    * not round() — half-up vs half-even rounding differs across
    * engines, floor does not). */
  def sq8Encode(df: DataFrame, idCol: String, vecCol: String,
      m: Sq8Model): DataFrame = {
    val mins = array(m.mins.map(lit(_)): _*)
    val scales = array(m.scales.map(lit(_)): _*)
    df.select(col(idCol),
      transform(col(vecCol), (x, i) => {
        val s = element_at(scales, i + 1)
        when(s > 0, least(lit(255),
          greatest(lit(0),
            floor((x.cast("double") - element_at(mins, i + 1)) / s + 0.5)
              .cast("int"))))
          .otherwise(lit(0))
      }).as("codes"))
  }

  /** Approximate cosine top-k over SQ8 codes: dequantize per row
    * (v̂_j = min_j + scale_j·code_j — a pure projection, no codebook
    * join) and score against the query. The scan reads 1 byte/dim
    * instead of 4; the arithmetic stays one codegen'd span ending in
    * TakeOrdered. Exact re-rank composes exactly like [[adcRefineTopK]]
    * when the estimate orders a shortlist. */
  def sq8TopK(codes: DataFrame, idCol: String, codesCol: String,
      m: Sq8Model, query: Array[Double], topK: Int): DataFrame = {
    val mins = array(m.mins.map(lit(_)): _*)
    val scales = array(m.scales.map(lit(_)): _*)
    val q = typedlit(query.toSeq)
    val vhat = transform(col(codesCol), (c, i) =>
      element_at(mins, i + 1) +
        element_at(scales, i + 1) * c.cast("double"))
    val scored = codes.select(col(idCol), vhat.as("__vhat"))
      .select(col(idCol),
        Similarity.cosine(col("__vhat"), q).as("est_cosine"))
    scored.orderBy(col("est_cosine").desc, col(idCol)).limit(topK)
  }

  /** Batched SQ8 serving — the [[Ivf.probeMany]] shape for scalar
    * quantization: top-k for EVERY query in ONE codes scan. The query
    * batch rides the plan as a generated literal array (per code row:
    * reconstruct v̂ once, explode the |Q| queries, score each — a
    * Generate, not a nested-loop join), and a per-query window keeps k.
    * Per query, results equal [[sq8TopK]] exactly — same estimate,
    * same (score desc, id) order (PqSpec). Row amplification is
    * |Q|-bounded and feeds straight into a partial TakeOrdered window,
    * so the scan cost — the 1 byte/dim read sq8 exists for — amortizes
    * across the whole request batch. */
  def sq8TopKMany(codes: DataFrame, idCol: String, codesCol: String,
      m: Sq8Model, queries: Seq[(Long, Array[Double])],
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty, "sq8TopKMany needs at least one query")
    val mins = array(m.mins.map(lit(_)): _*)
    val scales = array(m.scales.map(lit(_)): _*)
    val vhat = transform(col(codesCol), (c, i) =>
      element_at(mins, i + 1) +
        element_at(scales, i + 1) * c.cast("double"))
    val qlit = typedlit(queries.map { case (qid, q) => (qid, q.toSeq) })
    val scored = codes
      .select(col(idCol), vhat.as("__vhat"))
      .select(col(idCol), col("__vhat"), explode(qlit).as("__q"))
      .select(col("__q._1").as("query_id"), col(idCol),
        Similarity.cosine(col("__vhat"), col("__q._2")).as("est_cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("est_cosine").desc, col(idCol).asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topK).drop("__rn")
  }
}
