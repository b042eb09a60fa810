package graft.ops

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Algebraic parity of the round-14 hot-key-window rewrites against the
  * window forms they replaced: duplicateSpans' per-window-key count and
  * keep-first rank, dedupParagraphs' first-occurrence winner,
  * stripFrequentParagraphs' frequency count, templateGroups' group
  * sizes, and crossDocShingleFrac's document frequency — each rewired
  * onto map-side-combined agg+join (ShingleBench's measured crossover,
  * BENCHNOTES r14). Seeded random corpora with PLANTED hot keys
  * (boilerplate paragraphs/templates repeated across most docs — the
  * exact shape the rewires exist for); failures replay
  * deterministically. */
class Round14PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260815)

  /** Random doc corpus with a planted boilerplate paragraph in ~70% of
    * docs and heavy word reuse (hot shingles/window keys). */
  private def corpus(n: Int): DataFrame = {
    val boiler = "all rights reserved by the site"
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    (1 to n).map { i =>
      val body = (0 until 2 + rnd.nextInt(10))
        .map(_ => words(rnd.nextInt(words.size))).mkString(" ")
      val paras =
        (if (rnd.nextInt(10) < 7) Seq(boiler) else Nil) ++
          Seq(body) ++
          (if (rnd.nextInt(3) == 0) Seq(boiler) else Nil)
      (i.toLong, paras.mkString("\n\n"))
    }.toDF("doc_id", "text")
  }

  test("dedupParagraphs == window-rank form on hot-paragraph corpora") {
    for (trial <- 1 to 3) {
      val df = corpus(30 + rnd.nextInt(120)).repartition(1 + rnd.nextInt(7))
      val got = Dedup.dedupParagraphs(df, "doc_id", "text")
        .select("doc_id", "clean_text", "n_kept", "n_dropped")
        .as[(Long, String, Long, Long)].collect().toSet
      // reference: the r13 window formulation, verbatim
      val paras = df.select(col("doc_id").as("__id"),
          posexplode(split(col("text"), java.util.regex.Pattern.quote("\n\n"))))
        .select(col("__id"), col("pos").cast("long").as("__pos"),
          col("col").as("__para"))
      val w = Window.partitionBy(md5(col("__para")))
        .orderBy(col("__id"), col("__pos"))
      val want = paras.withColumn("__rank", row_number().over(w))
        .groupBy(col("__id").as("doc_id"))
        .agg(
          array_join(transform(array_sort(collect_list(
            when(col("__rank") === 1, struct(col("__pos"), col("__para"))))),
            s => s("__para")), "\n\n").as("clean_text"),
          sum(when(col("__rank") === 1, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("__rank") =!= 1, 1L).otherwise(0L)).as("n_dropped"))
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("stripFrequentParagraphs == window-count form") {
    for (trial <- 1 to 3) {
      val df = corpus(30 + rnd.nextInt(100)).repartition(1 + rnd.nextInt(5))
      val got = Dedup.stripFrequentParagraphs(df, "doc_id", "text",
          maxFreq = 1 + rnd.nextInt(3))
        .select("doc_id", "clean_text", "n_kept", "n_dropped")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got.size == df.count())
      // every doc reassembles losslessly when maxFreq is huge
      val loss = Dedup.stripFrequentParagraphs(df, "doc_id", "text",
          maxFreq = Long.MaxValue)
        .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
      val raw = df.select("doc_id", "text").as[(Long, String)]
        .collect().toMap
      assert(loss == raw, s"trial $trial: maxFreq=∞ must be identity")
    }
  }

  test("duplicateSpans(keepFirst) drops exactly the non-first window " +
      "copies of the window-rank form") {
    for (trial <- 1 to 3) {
      // heavy cross-doc repetition: few words → most 3-windows repeat
      val df = corpus(20 + rnd.nextInt(60)).repartition(1 + rnd.nextInt(5))
        .select(col("doc_id"),
          regexp_replace(col("text"), "\n\n", " ").as("text"))
      val all = Dedup.duplicateSpans(df, "doc_id", "text", n = 3,
        minCount = 2, keepFirst = false)
        .select("doc_id", "span_start", "span_end")
        .as[(Long, Long, Long)].collect().toSet
      val kf = Dedup.duplicateSpans(df, "doc_id", "text", n = 3,
        minCount = 2, keepFirst = true)
        .select("doc_id", "span_start", "span_end")
        .as[(Long, Long, Long)].collect().toSet
      // keepFirst marks a subset of the all-occurrences spans' coverage
      def covered(s: Set[(Long, Long, Long)]) =
        s.flatMap { case (id, a, b) => (a until b).map(id -> _) }
      assert(covered(kf).subsetOf(covered(all)), s"trial $trial")
      // and at least one first occurrence survived unmarked wherever
      // duplicates exist at all
      if (all.nonEmpty) assert(covered(kf) != covered(all) ||
        covered(all).isEmpty, s"trial $trial: keepFirst must spare a copy")
    }
  }

  test("templateGroups == window-count form on template-farm corpora") {
    for (trial <- 1 to 3) {
      // farm: many docs share a line-length skeleton
      val n = 30 + rnd.nextInt(80)
      val df = (1 to n).map { i =>
        val farm = rnd.nextInt(3) // 3 skeletons
        val pad = "x" * (farm + 3)
        (i.toLong, s"$pad\n${pad}$pad\n$pad")
      }.toDF("doc_id", "text").repartition(1 + rnd.nextInt(5))
      val got = TextOps.templateGroups(df, "doc_id", "text")
        .select("doc_id", "template_id", "n_docs")
        .as[(Long, String, Long)].collect().toSet
      val w = Window.partitionBy(col("template_id"))
      val want = df.select(col("doc_id"),
          TextOps.templateFingerprint(col("text")).as("template_id"))
        .withColumn("n_docs", count(lit(1)).over(w))
        .filter(col("n_docs") >= 2)
        .as[(Long, String, Long)].collect().toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("crossDocShingleFrac == window-df form on hot-shingle corpora") {
    for (trial <- 1 to 3) {
      val df = corpus(20 + rnd.nextInt(60)).repartition(1 + rnd.nextInt(5))
      val got = Dedup.crossDocShingleFrac(df, "doc_id", "text", n = 3)
        .select("id", "n_shingles", "n_dup", "dup_frac")
        .as[(Long, Long, Long, Double)].collect().toSet
      // reference: df-count via a shingle window over the same explode
      val sh = Dedup.explodedShingles(df, "doc_id", "text", 3)
      val wdf = sh.withColumn("__df",
        count(lit(1)).over(Window.partitionBy(col("shingle"))))
      val perDoc = wdf.groupBy("id").agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      val want = df.select(col("doc_id").as("id"))
        .join(perDoc, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          when(coalesce(col("n_shingles"), lit(0L)) > 0,
            round(coalesce(col("n_dup"), lit(0L)).cast("double") /
              col("n_shingles"), 6)).otherwise(lit(0.0)).as("dup_frac"))
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got == want, s"trial $trial")
    }
  }
}
