package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan-shape audit over the whole catalog: per query, the operators that
  * determine scale behavior (exchanges, join strategies, codegen spans,
  * cartesian products). Output is a markdown table (PLANS.md) — the
  * review artifact for "would this plan survive 100×?".
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // static plans: AQE wraps the tree pre-execution and hides the
      // codegen markers; runtime AQE plans are audited via the bench
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    def count(s: String, token: String): Int =
      token.r.findAllMatchIn(s).length

    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, fn) =>
      try {
        val qe = fn(spark, dir).queryExecution
        val p = qe.executedPlan.toString
        val simple = qe.explainString(
          org.apache.spark.sql.execution.SimpleMode)
        // range-structured exchanges: classic rangepartitioning PLUS the
        // r14 two-pass-rank signature — a deterministic range_bucket id
        // routed through a hashpartitioning(__gr_rt) exchange (explicit
        // boundaries instead of RangePartitioner sampling; Ranks.scala)
        val rangeEx = count(p, "Exchange rangepartitioning") +
          count(p, "Exchange hashpartitioning\\(__gr_rt")
        val exchanges = count(p, "Exchange hashpartitioning") +
          count(p, "Exchange rangepartitioning") +
          count(p, "Exchange RoundRobinPartitioning")
        // Window operators remaining in the plan: after the r13 two-pass
        // rank rewrite these must only be the BOUNDED frames (offset
        // tables, O(groups) allocation math, top-k-limited results) —
        // a corpus-keyed Window is the single-reducer-per-group shape
        val windows = count(p, "Window \\[")
        val bcast = count(p, "BroadcastExchange")
        val smj = count(p, "SortMergeJoin")
        val bhj = count(p, "BroadcastHashJoin")
        val cartesian =
          if (p.contains("CartesianProduct") ||
            p.contains("BroadcastNestedLoopJoin")) "YES" else "-"
        // codegen'd spans appear as "*(n)" markers in the simple plan
        val codegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(simple)
          .map(_.group(1).toInt).toSet.size
        // scans whose PartitionFilters is non-empty: the probe of a
        // persisted index reads only its pruned partition directories
        val pruned = count(p, "PartitionFilters: \\[[^\\]]")
        val prunedCell = if (pruned > 0) s"$pruned" else "-"
        // Expand nodes (multi-distinct / grouping sets): row-amplifying
        // map-side — gated by CatalogPlanInvariantsSpec's allowlist
        val expand = if (p.contains("Expand")) "YES" else "-"
        f"| $n | $exchanges | $rangeEx | $windows | $bcast | $bhj/$smj | $cartesian | $expand | $codegen | $prunedCell |"
      } catch {
        // one filler cell per metric column (9 after the error cell) so a
        // failed-to-plan query still renders as a valid 10-column row
        case e: Throwable =>
          s"| $n | err: ${e.getClass.getSimpleName} " + ("| - " * 8) + "|"
      }
    }

    // Batched-serving LUT form audit: plan size literal vs join at a
    // 200-query batch (the scale the literal form is NOT for). Uses a
    // tiny throwaway index — only the PLAN is being measured.
    val lutSection = try {
      import org.apache.spark.sql.functions.col
      val spark2 = spark
      import spark2.implicits._
      val vecs = (0 until 40).map(i => (i.toLong,
        Array.tabulate(8)(d => (if (i < 20) 1.0f else -1.0f) *
          (if (d < 4) 1f else 0.5f) + (i % 5) * 0.01f)))
        .toDF("vec_id", "embedding")
      val coarse = graft.ops.Ivf.train(vecs, "vec_id", "embedding", 2, 2)
      val cb = graft.ops.Pq.train(vecs, "vec_id", "embedding", 2, 4, 4)
      val path = java.nio.file.Files
        .createTempDirectory("graft_planaudit_lut").toString + "/idx"
      graft.ops.Pq.index(vecs, "vec_id", "embedding", coarse, cb, path)
      val qs = (0 until 200).map(i => (i.toLong,
        Array.tabulate(8)(d => (if (i % 2 == 0) 1.0 else -1.0) *
          (if (d < 4) 1.0 else 0.5))))
      def planLen(lutLiteralMax: Int) =
        graft.ops.Pq.probeManyIndexed(spark, path, "vec_id", qs,
          topK = 5, nprobe = 1, lutLiteralMax = lutLiteralMax)
          .queryExecution.analyzed.toString.length
      val lit = planLen(Int.MaxValue)
      val join = planLen(0)
      s"""
         |## Batched ADC serving — LUT plan size at 200 queries
         |
         |`Pq.probeManyIndexed` ships per-query ADC lookup tables as one
         |map literal only up to `LutLiteralMaxQueries` (=${graft.ops.Pq.LutLiteralMaxQueries})
         |queries; above that they ride the broadcast routing table as
         |data. Measured analyzed-plan size at a 200-query batch:
         |literal form $lit chars (O(batch·m·k) doubles in the expression
         |tree) vs join form $join chars (constant in batch size) —
         |${lit / join.max(1)}× smaller. Equality of the two forms is
         |spec-proven (PqSpec "join-LUT path == literal-LUT path").
         |""".stripMargin
    } catch { case e: Throwable => s"\n(lut audit failed: ${e.getMessage})\n" }

    val out =
      """# PLANS — catalog plan-shape audit (sf0.001, AQE static plans)
        |
        |Generated by `graft.tools.PlanAudit`. Shuffle/broadcast counts are
        |static-plan counts (AQE may further coalesce or reuse at runtime).
        |`Cartesian` flags CartesianProduct/BroadcastNestedLoopJoin — the
        |shipped catalog is expected to contain NONE (the all-pairs
        |verification baseline is size-gated and spec-only). `pruned scans`
        |counts scans with non-empty PartitionFilters — the persisted-index
        |probes (q_x_ann_*_pruned) must show one. `expand` flags Expand
        |nodes (multi-distinct / grouping sets — row-amplifying); only the
        |allowlisted intentional ones (q_x_rollup, q_x_unpivot) may show it.
        |`range` counts range-structured exchanges: classic
        |rangepartitioning plus the r14 two-pass-rank signature — a
        |deterministic `range_bucket` id (explicit driver-sampled
        |boundaries, no RangePartitioner re-sampling, no pinned persist)
        |routed through a `hashpartitioning(__gr_rt)` exchange. Rank plans
        |carry NO InMemoryRelation since r14, so chained-rank counts are
        |real plan counts. `windows` counts Window operators left in the
        |plan — these are only BOUNDED frames (O(groups) offset and
        |allocation tables, top-k-limited results), never a corpus keyed
        |by provenance or content hash (the r14 sweep also moved the
        |shingle-df, window-key, and paragraph-hash counts off windows
        |onto map-side-combined aggregates — ShingleBench, BENCHNOTES).
        |
        || query | shuffles | range | windows | broadcasts | BHJ/SMJ | cartesian | expand | codegen spans | pruned scans |
        ||---|---|---|---|---|---|---|---|---|---|
        |""".stripMargin + rows.mkString("\n") + "\n" + lutSection
    java.nio.file.Files.write(java.nio.file.Paths.get("PLANS.md"),
      out.getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
