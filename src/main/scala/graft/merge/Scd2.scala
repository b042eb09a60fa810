package graft.merge

import graft.core.Cdc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-type-2 history — the natural warehouse extension of the
  * reference's SCD-1 loader (SURVEY §2.4: tipoca-stream only ever keeps
  * the latest row per PK, load_processor.go:386–444; audit/compliance
  * consumers of the same CDC feed want every version with validity
  * intervals instead).
  *
  * Model: one history row per (pk, version) with `valid_from` (the
  * version that created it), `valid_to` (the next version of that pk,
  * NULL while open) and `is_current`. A DELETE event closes the
  * predecessor's interval and emits no row of its own — the pk simply
  * has no current version until recreated.
  *
  * Scale shape: ONE shuffle on the PK for everything. Re-delivery
  * dedupe (same pk+version), interval ends (`lead`), and the
  * incremental merge's late-row guard all ride the same
  * `Window.partitionBy(pk)` — never the UPDATE-then-INSERT self-join a
  * SQL formulation pays, and no broadcast of the open-row key set
  * (which is dimension-sized, NOT batch-sized, at 100 TB). Closed
  * history is untouched: [[merge]] unions it back verbatim; only open
  * rows ride the window with the micro-batch. Full [[build]] and
  * incremental [[merge]] share one code path, so batch bootstrap and
  * per-trigger advance cannot drift apart (Scd2Spec proves
  * build == split-merge).
  */
object Scd2 {

  /** Build the full history from a version stream. `stage` carries the
    * payload columns, `versionCol` (a monotone per-pk version — the CDC
    * offset, an event id, a timestamp) and [[Cdc.OperationColumn]].
    * Duplicate (pk, version) rows collapse to one (re-delivery safe;
    * survivor arbitrary among differing payloads, as with
    * `dropDuplicates`). */
  def build(stage: DataFrame, pks: Seq[String],
      versionCol: String): DataFrame = {
    val v = col(versionCol).cast("long")
    val w = Window.partitionBy(pks.map(col): _*).orderBy(v)
    stage
      .withColumn("valid_from", v)
      // same-version re-deliveries are adjacent in the window order:
      // keep the first (one window, not a dropDuplicates shuffle on a
      // different key)
      .withColumn("__dup", lag(col("valid_from"), 1).over(w))
      .filter(col("__dup").isNull || col("__dup") =!= col("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current",
        col("valid_to").isNull &&
          col(Cdc.OperationColumn) =!= Cdc.OpDelete)
      .filter(col(Cdc.OperationColumn) =!= Cdc.OpDelete)
      .drop("__dup", Cdc.OffsetColumn, Cdc.OperationColumn)
  }

  /** Advance an existing history by a micro-batch: closed rows pass
    * through untouched (never shuffled, never rewritten — at 100 TB the
    * closed majority is the table); open rows re-enter the window with
    * the batch's new versions and close if a newer version (or DELETE)
    * of their pk arrived. Batch versions at or before a pk's open
    * `valid_from` are late relative to already-closed intervals and are
    * dropped (closed history is immutable by contract) — the guard is a
    * max-over-pk window on the same shuffle, not a join.
    *
    * `stage` has the same shape [[build]] takes. */
  def merge(history: DataFrame, stage: DataFrame, pks: Seq[String],
      versionCol: String): DataFrame = {
    val closed = history.filter(!col("is_current"))
    val open = history.filter(col("is_current"))
      .drop("valid_to", "is_current")
    // open rows re-enter as pseudo-stage entries at their valid_from
    val openAsStage0 = open
      .withColumn(versionCol, col("valid_from"))
      .withColumn(Cdc.OperationColumn, lit(Cdc.OpUpdate))
      .withColumn("__open", lit(1))
      .drop("valid_from")
    val stageCols = (stage.columns :+ "__open").toSeq
    val openAsStage = stage.columns.foldLeft(openAsStage0)((d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null)))
      .select(stageCols.map(col): _*)
    val combined = openAsStage.unionByName(
      stage.withColumn("__open", lit(0)).select(stageCols.map(col): _*))
    val wPk = Window.partitionBy(pks.map(col): _*)
    val v = col(versionCol).cast("long")
    val guarded = combined
      .withColumn("__open_from",
        max(when(col("__open") === 1, v)).over(wPk))
      .filter(col("__open") === 1 ||
        col("__open_from").isNull || v > col("__open_from"))
      .drop("__open", "__open_from")
    closed.unionByName(build(guarded, pks, versionCol),
      allowMissingColumns = false)
  }

  /** Point-in-time read: the table exactly as of `version` — each pk's
    * row whose interval covers it (valid_from <= version < valid_to).
    * A pure filter over the history (predicate-pushdown friendly; with
    * the history z-ordered on (pk, valid_from) it prunes to the
    * covering files): the query that makes keeping SCD2 worthwhile —
    * "reproduce the dimension the model was trained against". */
  def asOf(history: DataFrame, version: Long): DataFrame =
    history.filter(col("valid_from") <= version &&
        (col("valid_to").isNull || col("valid_to") > version))
      .drop("valid_to", "is_current")
}
