package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Full-text relevance scoring (BM25) over a document corpus — the
  * retrieval half of a training-data curation stack (pair mining, eval
  * retrieval baselines, quality probes against a seed query set).
  *
  * Shape at scale: ONE shuffle on the doc id. The token stream is
  * filtered to the query's terms BEFORE the exchange (the non-matching
  * ~99.9% of tokens never leave the map side), per-doc term frequencies
  * are static pivot columns (query terms are known at plan time, so tf_t
  * is `sum(CASE term = t)` in a single aggregate — no second shuffle for
  * a (doc, term) matrix), and the two corpus scalars (N, Σdl) plus the
  * per-term document frequencies are 1-row / k-row aggregates that
  * broadcast back. Top-k is `TakeOrderedAndProject` — no global sort.
  *
  * Cross-engine determinism: every FP step is either exact (tf, dl, df
  * are integers; each per-term partial sum aggregates exactly one
  * non-null row) or a fixed parse tree of IEEE ops mirrored literally by
  * [[bm25OracleSql]]; the per-term partials fold in query-term order on
  * both sides. The only 1-ulp surface is `ln` in the idf.
  */
object Search {

  val K1 = 1.2
  val B = 0.75

  /** Normalized whitespace tokens of a text column (shared with the
    * dedup/vocab paths so search and dedup agree on what a term is). */
  private def toks(text: Column): Column =
    TextOps.tokens(TextOps.normalized(text))

  /** BM25 top-k: score every document containing at least one query
    * term; emit (id, score rounded to 4 dp) best-first, ties broken by
    * id.
    *
    * NOTE: query construction is EAGER — the corpus scalars (N, Σdl)
    * and per-term document frequencies are computed by Spark jobs
    * (`head()` on 1-row aggregates, plus a `localCheckpoint` of the
    * per-doc tf frame) at call time, not at action time. Callers that
    * only want to build a plan should defer the call itself. An empty
    * corpus returns an empty (id, score) frame without evaluating the
    * avgdl division. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      "query terms must be non-empty and distinct")
    val id = col(idCol)
    val base = df.select(id, toks(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast(LongType))

    // corpus scalars: doc count and total token mass (exact integers).
    // Collected to the driver (2 longs) rather than cross-joined back:
    // a 1-row BroadcastNestedLoopJoin is harmless at runtime but breaks
    // the catalog's zero-cartesian invariant and splits whole-stage
    // codegen around itself.
    val statsRow = base.agg(count(lit(1)).as("__n"),
      sum(col("__dl")).as("__sumdl")).head()
    val nDocs = statsRow.getLong(0)
    val sumDl = if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1)
    // empty corpus: avgdl = sumDl/nDocs would be a 0/0 NaN literal;
    // nothing can match, so return the empty scored frame directly
    if (nDocs == 0L)
      return base.select(id, lit(0.0).as("score")).limit(0)

    // one shuffle: per-doc tf for each query term + the doc's length.
    // Materialized once — the per-term document frequencies below and
    // the scoring pass both read it, and without the checkpoint the
    // term-filtered token shuffle would run twice.
    val tfCols = queryTerms.map(t =>
      sum(when(col("__term") === t, 1L).otherwise(0L)).as(tfName(t)))
    val perDoc = base
      .select(id, col("__dl"), explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(queryTerms: _*))
      .groupBy(id)
      .agg(max(col("__dl")).as("__dl"), tfCols: _*)
      .localCheckpoint()
    graft.core.Metrics.deferUnpersist(perDoc)

    // per-term document frequencies: one k-long scalar row off the
    // checkpointed frame
    val dfCols = queryTerms.map(t =>
      sum(when(col(tfName(t)) > 0L, 1L).otherwise(0L)).as(dfName(t)))
    val dfRow = perDoc.agg(dfCols.head, dfCols.tail: _*).head()
    // no document matched any term → the sums are NULL; zero dfs keep
    // the (empty) scoring projection well-typed instead of NPE-ing
    val docFreq = queryTerms.zipWithIndex.map { case (t, i) =>
      t -> (if (dfRow.isNullAt(i)) 0L else dfRow.getLong(i))
    }.toMap

    val scored = perDoc
      .withColumn("__n", lit(nDocs))
      .withColumn("__avgdl", lit(sumDl.toDouble / nDocs.toDouble))
      .withColumns(queryTerms.map(t => dfName(t) -> lit(docFreq(t))).toMap)
    // fixed-order fold of per-term partials (each exact-by-construction)
    val score = queryTerms.map { t =>
      val tf = col(tfName(t)).cast(DoubleType)
      val idf = log(
        ((col("__n") - col(dfName(t))).cast(DoubleType) + lit(0.5)) /
          (col(dfName(t)).cast(DoubleType) + lit(0.5)) + lit(1.0))
      val partial = idf * ((tf * lit(K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) +
          (lit(B) * col("__dl").cast(DoubleType)) / col("__avgdl"))))
      when(col(tfName(t)) > 0L, partial).otherwise(lit(0.0))
    }.reduce(_ + _)

    scored.select(id, round(score, 4).as("score"))
      .orderBy(col("score").desc, id)
      .limit(k)
  }

  private def tfName(t: String) = s"__tf_$t"
  private def dfName(t: String) = s"__df_$t"

  /** DuckDB replay of [[bm25TopK]] — identical expression tree, constants
    * rendered from the same doubles. */
  def bm25OracleSql(table: String, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): String =
    s"""WITH ${bm25Ctes(table, idCol, textCol, queryTerms)}
       |SELECT $idCol, ${bm25ScoreExpr(idCol, queryTerms)} AS score
       |FROM scored
       |ORDER BY score DESC, $idCol LIMIT $k""".stripMargin

  /** The WITH-clause body (`base, dls, stats, toks, perdoc, dfs,
    * scored`) shared by [[bm25OracleSql]] and rank-fusion oracles. */
  def bm25Ctes(table: String, idCol: String, textCol: String,
      queryTerms: Seq[String]): String = {
    val norm = s"trim(regexp_replace(lower(coalesce($textCol, '')), " +
      s"'[^\\p{L}\\p{N}]+', ' ', 'g'))"
    val termList = queryTerms.map(t => s"'$t'").mkString(", ")
    val tfSel = queryTerms.map(t =>
      s"sum(CASE WHEN term = '$t' THEN 1 ELSE 0 END)::BIGINT " +
        s"AS tf_${t}").mkString(",\n    ")
    val dfSel = queryTerms.map(t =>
      s"sum(CASE WHEN tf_${t} > 0 THEN 1 ELSE 0 END)::BIGINT " +
        s"AS df_${t}").mkString(",\n    ")
    s"""base AS (
       |  SELECT $idCol, $norm AS norm FROM $table),
       |dls AS (
       |  SELECT $idCol,
       |    CASE WHEN norm = '' THEN 0
       |         ELSE len(string_split_regex(norm, '\\s+')) END::BIGINT
       |      AS dl,
       |    norm
       |  FROM base),
       |stats AS (
       |  SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl
       |  FROM dls),
       |toks AS (
       |  SELECT $idCol, dl,
       |    unnest(string_split_regex(norm, '\\s+')) AS term
       |  FROM dls WHERE norm <> ''),
       |perdoc AS (
       |  SELECT $idCol, max(dl) AS dl,
       |    $tfSel
       |  FROM toks WHERE term IN ($termList)
       |  GROUP BY $idCol),
       |dfs AS (
       |  SELECT
       |    $dfSel
       |  FROM perdoc),
       |scored AS (
       |  SELECT perdoc.*, stats.n,
       |    CAST(stats.sumdl AS DOUBLE) / CAST(stats.n AS DOUBLE) AS avgdl,
       |    dfs.*
       |  FROM perdoc CROSS JOIN stats CROSS JOIN dfs)""".stripMargin
  }

  /** The rounded BM25 score expression over the `scored` CTE. */
  def bm25ScoreExpr(idCol: String, queryTerms: Seq[String]): String = {
    val partials = queryTerms.map { t =>
      val idf = s"ln(((CAST(n - df_${t} AS DOUBLE) + 0.5) / " +
        s"(CAST(df_${t} AS DOUBLE) + 0.5)) + 1.0)"
      s"(CASE WHEN tf_${t} > 0 THEN $idf * " +
        s"((CAST(tf_${t} AS DOUBLE) * ${K1 + 1.0}) / " +
        s"(CAST(tf_${t} AS DOUBLE) + $K1 * (${1.0 - B} + " +
        s"($B * CAST(dl AS DOUBLE)) / avgdl))) ELSE 0.0 END)"
    }.mkString("\n    + ")
    s"round(\n    $partials, 4)"
  }

  /** Reciprocal-rank fusion of ranked lists: each list is (id, rank
    * 1..n); fused score = Σ 1/(rrfK + rank) with absent ids
    * contributing 0, folded in LIST ORDER (cross-engine deterministic
    * — each term is one IEEE division of exact integers). The robust
    * way to combine lexical (BM25) and dense (ANN) retrieval without
    * score calibration. Lists are top-n — k-sized, broadcast — so
    * fusion costs no corpus shuffle. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int,
      rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty)
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol), col("rank").as(s"__r_$i"))
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq(idCol), "full"))
    val score = rankings.indices.map { i =>
      when(col(s"__r_$i").isNotNull,
        lit(1.0) / (lit(rrfK) + col(s"__r_$i")).cast(DoubleType))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    joined.select(col(idCol), round(score, 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }
}
