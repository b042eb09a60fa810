package graft.mask

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    // (id, nation, segment) — group (1, "A") has 3 members, (2, "B") 1
    (1L, 1, "A"), (2L, 1, "A"), (3L, 1, "A"),
    (4L, 2, "B"),
    (5L, 3, "C"), (6L, 3, "C")).toDF("id", "nation", "segment")

  test("kAnonymize suppresses groups below k and attaches achieved k") {
    val out = Privacy.kAnonymize(people, Seq("nation", "segment"), k = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("k_group"))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L, 6L)) // id 4 suppressed
    assert(out(1L) == 3L && out(5L) == 2L)
    // k = 1 releases everything; k above the max group releases nothing
    assert(Privacy.kAnonymize(people, Seq("nation", "segment"), 1)
      .count() == 6)
    assert(Privacy.kAnonymize(people, Seq("nation", "segment"), 4)
      .count() == 0)
  }

  test("kAnonymityReport: per-group release verdicts") {
    val rep = Privacy.kAnonymityReport(people, Seq("nation"), k = 2)
      .collect().map(r => r.getAs[Int]("nation") ->
        ((r.getAs[Long]("k_group"), r.getAs[Long]("released")))).toMap
    assert(rep(1) == ((3L, 1L)))
    assert(rep(2) == ((1L, 0L)))
    assert(rep(3) == ((2L, 1L)))
  }

  test("lDiversify suppresses the homogeneous group k-anonymity leaks") {
    // (id, nation, diagnosis): group nation=1 is 3-anonymous but UNIFORM
    // in the sensitive column — kAnonymize releases it (the leak),
    // lDiversify suppresses it; nation=3 is 2-anonymous AND 2-diverse.
    val rows = Seq(
      (1L, 1, "flu"), (2L, 1, "flu"), (3L, 1, "flu"),
      (5L, 3, "flu"), (6L, 3, "cold")).toDF("id", "nation", "diagnosis")
    assert(Privacy.kAnonymize(rows, Seq("nation"), k = 2)
      .select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 5L, 6L)) // the leak: uniform group released
    val out = Privacy.lDiversify(rows, Seq("nation"), "diagnosis",
      k = 2, l = 2)
    assert(out.select("id").as[Long].collect().toSet == Set(5L, 6L))
    val r = out.filter(col("id") === 5L).head()
    assert(r.getAs[Long]("k_group") == 2L)
    assert(r.getAs[Long]("l_distinct") == 2L)
    // l = 1 degrades to plain k-anonymity
    assert(Privacy.lDiversify(rows, Seq("nation"), "diagnosis", 2, 1)
      .count() == 5)
    // sensitive column may not double as a quasi column
    assertThrows[IllegalArgumentException](
      Privacy.lDiversify(rows, Seq("diagnosis"), "diagnosis", 1, 1))
  }

  test("tCloseness suppresses the skewed group l-diversity passes") {
    // NOTE: with two EQUAL-size groups, Σ n_g(p_g − q) = 0 forces equal
    // TVDs — the test corpus must use unequal groups to discriminate.
    // N=12, global (flu 7, cold 5), q=(7/12, 5/12). nation=1 (4 rows,
    // {flu×3, cold}) is 2-diverse but skewed: TVD=1/6. nation=2
    // (8 rows, balanced 4/4): TVD=1/12.
    val rows = (Seq((1L, 1, "flu"), (2L, 1, "flu"), (3L, 1, "flu"),
      (4L, 1, "cold")) ++
      (5L to 12L).map(i => (i, 2, if (i % 2 == 1) "flu" else "cold")))
      .toDF("id", "nation", "diagnosis")
    assert(Privacy.lDiversify(rows, Seq("nation"), "diagnosis", 2, 2)
      .count() == 12) // the leak: both groups 2-diverse
    // t = 1/8: 1/12 ≤ 1/8 < 1/6 — skewed group suppressed
    val strict = Privacy.tCloseness(rows, Seq("nation"), "diagnosis",
      tNum = 1, tDen = 8)
    assert(strict.select("id").as[Long].collect().toSet ==
      (5L to 12L).toSet)
    // audit columns: 2·TVD·n_g·N — nation 1: 2·(1/6)·4·12 = 16;
    // nation 2: 2·(1/12)·8·12 = 16 (same numerator, different k_group)
    val audit = Privacy.tCloseness(rows, Seq("nation"), "diagnosis",
      tNum = 1, tDen = 1) // t=1 releases everything
    assert(audit.count() == 12)
    val byNation = audit.select("nation", "tvd2_num", "k_group")
      .distinct().collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byNation(1) == ((16L, 4L)))
    assert(byNation(2) == ((16L, 8L)))
    // boundary: t = 1/6 releases the skewed group too (gate is <=)
    assert(Privacy.tCloseness(rows, Seq("nation"), "diagnosis", 1, 6)
      .count() == 12)
    // k gate composes
    assert(Privacy.tCloseness(rows, Seq("nation"), "diagnosis", 1, 1,
      k = 5).count() == 8)
  }

  test("generalizeNum bands to the floor, negatives included") {
    val got = Seq(0L, 37L, 4999L, 5000L, -1L, -4999L, -5000L, -5001L)
      .toDF("v")
      .select(Privacy.generalizeNum(col("v"), 5000L).as("b"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 0L, 5000L, -5000L, -5000L, -5000L, -10000L))
  }
}
