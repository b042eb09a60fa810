package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** Streaming winnow quote detection: cross-batch and within-batch pair
  * emission, exactly-once replay, lineage adoption, compact safety. */
class WinnowQuoteStreamSpec extends SparkSpec {
  import spark.implicits._

  private val quote = (1 to 12).map("q" + _).mkString(" ")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_new", "id_corpus").as[(Long, Long)].collect().toSet

  test("a later batch quoting an earlier one is caught; strangers are not") {
    val dir = Files.createTempDirectory("winq").toString + "/fps"
    val s = new WinnowQuoteStream(spark, dir, "id", "t", k = 3, w = 4)
    val b0 = Seq((1L, s"corpus opening $quote corpus closing"),
      (2L, (1 to 20).map("c" + _).mkString(" "))).toDF("id", "t")
    assert(pairs(s.processBatch(b0, 0L)).isEmpty, "nothing to quote yet")
    val b1 = Seq((10L, s"batch intro $quote batch outro"),
      (11L, (1 to 20).map("z" + _).mkString(" "))).toDF("id", "t")
    val got = pairs(s.processBatch(b1, 1L))
    graft.core.Metrics.drainUnpersist()
    assert(got == Set((10L, 1L)), s"quote pair only: $got")
    val (batches, found, stored) = s.stats
    assert(batches == 2 && found == 1 && stored > 0)
  }

  test("maxFpDocs drops boilerplate fps at compact; real quotes keep witnessing (r18)") {
    val boiler = (1 to 12).map("b" + _).mkString(" ")
    def drive(cap: Long): Set[(Long, Long)] = {
      val dir = Files.createTempDirectory(s"winqcap$cap").toString + "/fps"
      val s = new WinnowQuoteStream(spark, dir, "id", "t", k = 3, w = 4,
        minShared = 1L, maxFpDocs = cap)
      // three corpus docs carry the boilerplate run with IDENTICAL
      // context through the winnowing windows that touch it (the first
      // differing token sits ≥ w+k kgrams past the run), so every
      // run-derived fp is selected by all three carriers — the cap's
      // carrier count is deterministic. Doc 1 also carries the real
      // quote — its fps are 1-doc rare and must survive.
      val mid = "shared middle padding tokens one two three four five six"
      s.processBatch(Seq(
        (1L, s"$boiler $mid $quote"),
        (2L, s"$boiler $mid uniquetwo ending"),
        (3L, s"$boiler $mid uniquethree ending")).toDF("id", "t"), 0L)
      graft.core.Metrics.drainUnpersist()
      s.compact() // the cap applies here
      val got = pairs(s.processBatch(Seq(
        (10L, s"page with $boiler footer"),
        (11L, s"essay quoting $quote verbatim")).toDF("id", "t"), 1L))
      graft.core.Metrics.drainUnpersist()
      got
    }
    // uncapped: the boilerplate fans doc 10 against all three carriers
    val off = drive(0L)
    assert(Set((10L, 1L), (10L, 2L), (10L, 3L), (11L, 1L))
      .subsetOf(off), s"uncapped must fan the boilerplate: $off")
    // capped at 2 carriers: boilerplate fps (3 carriers) are dropped —
    // doc 10 pairs with nobody, the 1-carrier quote still witnesses
    val on = drive(2L)
    assert(!on.exists(_._1 == 10L),
      s"capped boilerplate must stop witnessing: $on")
    assert(on.contains((11L, 1L)), s"rare-fp quote must survive: $on")
  }

  test("within-batch pair: smaller id plays corpus, counted once") {
    val dir = Files.createTempDirectory("winq2").toString + "/fps"
    val s = new WinnowQuoteStream(spark, dir, "id", "t", k = 3, w = 4)
    val b = Seq((5L, s"first carrier $quote here"),
      (9L, s"second carrier $quote there")).toDF("id", "t")
    val got = pairs(s.processBatch(b, 0L))
    graft.core.Metrics.drainUnpersist()
    assert(got == Set((9L, 5L)), s"one ordered within-batch pair: $got")
  }

  test("replaying a batch id reproduces identical pairs despite appended fps") {
    val dir = Files.createTempDirectory("winq3").toString + "/fps"
    val s = new WinnowQuoteStream(spark, dir, "id", "t", k = 3, w = 4)
    s.processBatch(Seq((1L, s"base doc $quote end")).toDF("id", "t"), 0L)
    val b = Seq((7L, s"echo $quote echo")).toDF("id", "t")
    val first = pairs(s.processBatch(b, 1L))
    // at-least-once replay: batch 1's own appended fps must be invisible
    val replay = pairs(s.processBatch(b, 1L))
    graft.core.Metrics.drainUnpersist()
    assert(first == replay && first == Set((7L, 1L)),
      s"first=$first replay=$replay")
    // without the visibility filter the replay would also pair 7 with
    // its own stored fps' carrier (itself) — excluded by construction
  }

  test("fresh-checkpoint lineage adopts the corpus; compact preserves pairs") {
    val dir = Files.createTempDirectory("winq4").toString + "/fps"
    val s1 = new WinnowQuoteStream(spark, dir, "id", "t", k = 3, w = 4)
    s1.processBatch(Seq((1L, s"origin $quote text")).toDF("id", "t"), 0L)
    // replay-duplicate some rows, then fold them away
    s1.processBatch(Seq((1L, s"origin $quote text")).toDF("id", "t"), 0L)
    s1.compact()
    // new lineage, batch ids restart at 0: corpus still visible
    val s2 = new WinnowQuoteStream(spark, dir, "id", "t", k = 3, w = 4,
      lineage = "restart")
    val got = pairs(s2.processBatch(
      Seq((20L, s"second life $quote quoted")).toDF("id", "t"), 0L))
    graft.core.Metrics.drainUnpersist()
    assert(got == Set((20L, 1L)), s"adopted corpus must pair: $got")
  }
}
