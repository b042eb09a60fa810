package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Domain-frequent line removal — the web-curation "boilerplate strip"
  * (nav bars, cookie banners, subscribe footers repeated on every page
  * of a site). A line is boilerplate within a group (site/domain) when
  * it appears in at least `minDf` documents AND in at least `minFrac`
  * of the group's documents; such lines are deleted everywhere and the
  * documents reassembled in original line order.
  *
  * Scale shape: the corpus explodes to lines once; the line
  * document-frequency aggregate shuffles on (group, line) — partial
  * aggregation absorbs within-partition repeats, and the per-site line
  * space is bounded by site size, not corpus size. The boilerplate set
  * that survives the threshold is tiny (lines repeated across ≥ minFrac
  * of a site), so the removal anti-join broadcasts it; reassembly is
  * one shuffle on the document id. Nothing in the plan is quadratic and
  * no stage holds more than a site's distinct lines.
  */
object Boilerplate {

  /** Per-(group, line) document frequency joined with the group's doc
    * count — the decision table [[strip]] thresholds. Exposed for
    * auditing what WOULD be stripped. */
  def lineStats(docs: DataFrame, idCol: String, keyCol: String,
      textCol: String): DataFrame = {
    val lines = docs.select(col(idCol), col(keyCol),
      explode(split(coalesce(col(textCol), lit("")), "\n")).as("line"))
    val perKey = docs.groupBy(col(keyCol))
      .agg(countDistinct(col(idCol)).as("n_docs"))
    // blank lines excluded here too, so this audit table shows exactly
    // the candidate set [[strip]] thresholds — no phantom boilerplate
    lines.filter(trim(col("line")) =!= "")
      .select(col(keyCol), col("line"), col(idCol)).distinct()
      .groupBy(col(keyCol), col("line"))
      .agg(count(lit(1)).as("df"))
      .join(perKey, keyCol)
  }

  /** Remove boilerplate lines and reassemble each document. Returns one
    * row per input document: the cleaned text plus kept/dropped line
    * counts (a fully-boilerplate document survives with empty text —
    * dropping rows is the dedup family's job, not the cleaner's). */
  def strip(docs: DataFrame, idCol: String, keyCol: String,
      textCol: String, minFrac: Double = 0.5, minDf: Int = 2): DataFrame = {
    val lines = docs.select(col(idCol), col(keyCol),
      posexplode(split(coalesce(col(textCol), lit("")), "\n"))
        .as(Seq("pos", "line")))
    val perKey = docs.groupBy(col(keyCol))
      .agg(countDistinct(col(idCol)).as("n_docs"))
    // candidate table derived from the SAME exploded frame (not a
    // second explosion via lineStats); blank lines are excluded — a
    // paragraph separator is present in most docs of any site and would
    // otherwise be "boilerplate", collapsing all paragraph structure
    val boiler = lines
      .filter(trim(col("line")) =!= "")
      .select(col(keyCol), col("line"), col(idCol)).distinct()
      .groupBy(col(keyCol), col("line"))
      .agg(count(lit(1)).as("df"))
      .join(perKey, keyCol)
      .filter(col("df") >= minDf &&
        col("df") >= col("n_docs") * minFrac)
      .select(col(keyCol), col("line"), lit(1).as("__boiler"))
    // flag instead of anti-join so kept text, kept count, and total
    // count come out of ONE id-shuffle aggregate (collect_list skips
    // the nulled-out boilerplate lines; an anti-join formulation needs
    // a second shuffle plus a rejoin just to keep all-boiler docs).
    // No broadcast hint: the boiler table is tiny per site but grows
    // with the number of sites, so at corpus scale it can exceed the
    // broadcast threshold — AQE picks broadcast when it actually fits,
    // and the join stays keyed on (site, line) as a shuffle join when
    // it doesn't.
    lines.join(boiler, Seq(keyCol, "line"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__boiler").isNull,
            struct(col("pos"), col("line"))))),
          _.getField("line")), "\n").as("clean_text"),
        count(when(col("__boiler").isNull, 1)).as("n_kept"),
        count(lit(1)).as("n_lines"))
      .select(col(idCol), col("clean_text"), col("n_kept"),
        (col("n_lines") - col("n_kept")).cast(LongType).as("n_dropped"))
  }
}
