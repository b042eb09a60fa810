package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end composition check: the full curation pipeline a training
  * corpus actually runs — repair → within-source calibration → exact +
  * near dedup → benchmark decontamination → variance-optimal audit →
  * temperature mixing → deterministic interleave — wired stage to
  * stage over one synthetic corpus, with the invariant each stage owes
  * the next asserted at the seam. The unit specs pin each operator
  * alone; this pins that the HANDOFFS compose (column contracts, row
  * conservation, determinism end to end). */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("repair → qnorm → dedup → decontaminate → neyman → mix → interleave") {
    val quote = (1 to 12).map("q" + _).mkString(" ")
    val base = (1 to 60).map { i =>
      val src = Seq("crawl", "books", "wiki")(i % 3)
      val body = (1 to 30).map(j => s"w${(i * 7 + j * 11) % 97}").mkString(" ")
      val text =
        if (i == 7 || i == 19)
          "the same exact boilerplate page twice" // exact dups (7/19)
        else if (i == 10) s"uses the $quote verbatim"  // contaminated
        else if (i % 5 == 0) body.replace("w1 ", "Ã© w1 ") // mojibake
        else body
      (i.toLong, src, text)
    }.toDF("doc_id", "source", "text")

    // 1: encoding screen — repair, and PROVE the detector goes quiet
    val repaired = base.select(col("doc_id"), col("source"),
      TextOps.repairMojibake(col("text")).as("text"))
    val stillDamaged = repaired.select(
      TextOps.mojibakeColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .filter(col("is_damaged")).count()
    assert(stillDamaged == 0, "repair leaves no detectable damage")

    // 2: within-source calibration on length — q_norm lands in [0,1]
    // for every source and survives as a column alongside the text
    val scored = CorpusStats.quantileNormalize(
      repaired.withColumn("len", length(col("text"))),
      Seq("source"), "len")
    assert(scored.filter(col("q_norm") < 0 || col("q_norm") > 1)
      .count() == 0)

    // 3: exact dedup keeps one of {7,19} (hash-keyed keep-first)
    val deduped = Dedup.exactKeep(scored, Seq("text"), "doc_id")
    val dupSurvivors = deduped
      .filter(col("doc_id").isin(7L, 19L)).count()
    assert(dupSurvivors == 1, "exactly one exact-dup twin survives")
    assert(deduped.count() == 59)

    // 4: decontaminate against the benchmark — doc 10's quote span is
    // CUT (doc kept), every other doc unchanged
    val bench = Seq(Tuple1(s"answer key: $quote")).toDF("btext")
    val clean = Dedup.decontaminate(deduped, "doc_id", "text",
      bench, "btext", n = 4)
    assert(clean.count() == 59, "decontamination cuts spans, not docs")
    val cut = clean.filter(col("n_dropped") > 0)
      .select("doc_id").as[Long].collect().toSeq
    assert(cut == Seq(10L), s"only the contaminated doc is cut: $cut")

    // 5: variance-optimal audit sample over the surviving corpus
    val audited = Sampling.neymanSample(
      clean.join(deduped.select("doc_id", "source"), "doc_id")
        .withColumn("len", col("n_kept")),
      "source", "len", "doc_id", 12L)
    assert(audited.count() <= 12L && audited.count() > 0)

    // 6: temperature mixing of the three sources sums exactly
    val counts = deduped.groupBy("source").count()
    val quotas = Sampling.temperatureMix(counts, "source", "count",
      alpha = 0.5, total = 30L)
    assert(quotas.agg(sum("quota")).as[Long].head() == 30L)

    // 7: interleave the final mix — positions unique, deterministic
    // under repartition, sources round-robin at the front
    val ordered = Sampling.interleave(deduped, "source", "doc_id")
    val a = ordered.select("doc_id", "pos").as[(Long, Long)]
      .collect().toSet
    val b = Sampling.interleave(deduped.repartition(7), "source", "doc_id")
      .select("doc_id", "pos").as[(Long, Long)].collect().toSet
    assert(a == b, "write order is partitioning-invariant end to end")
    assert(a.map(_._2).size == 59, "positions unique")
    val front = ordered.filter(col("pos") < 3)
      .select("source").as[String].collect().toSet
    assert(front == Set("crawl", "books", "wiki"),
      "the first slots round-robin the sources")
  }
}
