package graft.ops

import graft.functions.Portable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: group documents into packs whose
  * token budgets approach `budget` tokens, the step between curation and
  * batch assembly (every major pretraining pipeline packs documents into
  * fixed-length sequences to avoid padding waste).
  *
  * Exact first-fit packing is inherently sequential; the scalable,
  * replayable formulation is SHARDED NEXT-FIT: deterministically shard
  * documents (md5 of the id — uniform, engine-portable), order each shard
  * by the same hash, and cut packs by running token total. Pack boundaries
  * are a prefix-sum — `floor((cumsum - n) / budget)` — so a pack never
  * ends mid-document and every pack except a shard's last holds > budget −
  * max_doc_tokens of payload (next-fit's usual bound).
  *
  * Scale design: ONE shuffle (the shard key), windows sort within shards
  * only — shard count scales with the cluster, so no global sort and no
  * driver state. Oversized documents (n > budget) land in a pack of their
  * own, flagged `oversize` for the chunking stage downstream. Deterministic
  * across runs, cluster sizes and engines: the q_x_pack oracle replays the
  * exact shard/order/prefix-sum in SQL.
  */
object Packing {

  /** Assign each document a (shard, pack_id) and its position inside the
    * pack. `tokens`: a column name with the document's token count. */
  def nextFit(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    val h = Portable.h60(col(idCol).cast("string"))
    val w = Window.partitionBy(col("shard")).orderBy(h, col(idCol))
    df.withColumn("shard", pmod(h, lit(shards)).cast("int"))
      .withColumn("__cum",
        sum(col(tokensCol)).over(w.rangeBetween(Window.unboundedPreceding, 0)))
      // pack = budget-quantized prefix total EXCLUDING the current doc, so
      // a document always joins the pack its first token falls into and a
      // doc longer than the budget occupies its pack alone (floor stays
      // put until the running total passes the next budget multiple)
      .withColumn("pack_id",
        floor((col("__cum") - col(tokensCol)).cast("double") / budget)
          .cast("long"))
      .withColumn("pack_pos",
        row_number().over(
          Window.partitionBy(col("shard"), col("pack_id")).orderBy(h, col(idCol)))
          .cast("long"))
      .withColumn("oversize", (col(tokensCol) > budget).cast("boolean"))
      .drop("__cum")
  }
}
