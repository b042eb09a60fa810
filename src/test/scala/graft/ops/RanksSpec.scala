package graft.ops

import graft.SparkSpec
import graft.functions.Portable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parity proof for the two-pass distributed rank against the window form
  * it replaces (VERDICT r12 #1): identical rank / running-sum values on
  * skewed, tied, null-grouped, and repartitioned inputs — plus the plan
  * property the rewrite exists for: a RANGE exchange and no hash-by-group
  * corpus exchange. */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  // skewed: "web" has 700 rows, "ref" 30, "tiny" 3; null group too
  private def corpus: DataFrame = {
    val rows = (1 to 700).map(i => (s"w$i", "web", i % 13 + 1L)) ++
      (1 to 30).map(i => (s"r$i", "ref", i % 7 + 1L)) ++
      (1 to 3).map(i => (s"t$i", "tiny", 5L)) ++
      Seq(("n1", null, 2L), ("n2", null, 9L))
    rows.toDF("id", "source", "w")
  }

  private def windowRank(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(Portable.h60(col("id")), col("id"))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("w")).over(w))
  }

  private def twoPass(df: DataFrame, parts: Int = 0): DataFrame =
    Ranks.grouped(df, Seq("source"),
      Seq(Portable.h60(col("id")), col("id")),
      rankCol = Some("rk"),
      sums = Seq(Ranks.RunSum(col("w"), "cum", totalCol = Some("wtot"))),
      totalCountCol = Some("n"),
      numPartitions = parts)

  test("rank and running sum match the window form exactly") {
    val want = windowRank(corpus).select("id", "rk", "cum")
      .as[(String, Long, Long)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    val got = twoPass(corpus).select("id", "rk", "cum")
      .as[(String, Long, Long)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(got.size == want.size)
    assert(got == want)
  }

  test("totals: per-group row count and weight sum on every row") {
    val got = twoPass(corpus).select("source", "n", "wtot")
      .distinct().collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got("web")._1 == 700 && got("ref")._1 == 30)
    assert(got("tiny") == ((3L, 15L)))
    assert(got("NULL")._1 == 2 && got("NULL")._2 == 11L)
  }

  test("invariant to input partitioning and partition count") {
    val a = twoPass(corpus.repartition(17), parts = 3)
      .select("id", "rk", "cum").as[(String, Long, Long)].collect().toSet
    val b = twoPass(corpus.coalesce(1), parts = 11)
      .select("id", "rk", "cum").as[(String, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("ties: ranks are a valid permutation consistent with the key order") {
    // order by w alone — heavy ties; rank set must be 1..n per group and
    // ranks must be monotone in w
    val got = Ranks.grouped(corpus, Seq("source"), Seq(col("w")),
        rankCol = Some("rk"))
      .select("source", "w", "rk")
      .collect().map(r => (Option(r.getString(0)).getOrElse("NULL"),
        r.getLong(1), r.getLong(2)))
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
      val byRank = rs.sortBy(_._3).map(_._2)
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x <= y })
    }
  }

  test("global rank (no group columns) equals the global row_number") {
    val want = corpus
      .withColumn("grk", row_number().over(
        Window.orderBy(col("w"), col("id"))).cast("long"))
      .select("id", "grk").as[(String, Long)].collect().toMap
    val got = Ranks.grouped(corpus.repartition(5), Nil,
        Seq(col("w"), col("id")), rankCol = Some("grk"),
        totalCountCol = Some("n"), numPartitions = 7)
      .select("id", "grk", "n").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(x => x._1 -> x._2).toMap == want)
    assert(got.forall(_._3 == 735L))
  }

  test("plan: one deterministic bucket exchange, no hash-by-group corpus " +
      "exchange, no pinned materialization") {
    // repartition first: over a bare LocalRelation the optimizer folds
    // the bucket projection into the LocalTableScan and hides it
    val plan = twoPass(corpus.repartition(2)).queryExecution.sparkPlan
    val txt = plan.toString
    // corpus exchange keyed on the routing token of the deterministic
    // range_bucket id (the r14 redesign: explicit boundaries, no
    // RangePartitioner sampling, no persist)
    assert(txt.contains("hashpartitioning(__gr_rt"),
      s"expected the __gr_rt bucket-routing exchange in:\n$txt")
    assert(txt.contains("range_bucket"),
      s"expected the range_bucket expression in:\n$txt")
    assert(txt.contains("GroupRunningAgg"))
    // the r13 persist is gone: determinism is structural now
    assert(!txt.contains("InMemoryRelation") &&
      !txt.contains("InMemoryTableScan"),
      s"rank plan must not pin a cached corpus:\n$txt")
    // hash exchanges on group-only keys are legal ONLY over the tiny
    // stats frame (below: a HashAggregate keyed by the bucket id) —
    // a group hash of the CORPUS is the single-reducer shape this
    // primitive replaces
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val offenders = plan.collect {
      case e: ShuffleExchangeExec
          if !e.outputPartitioning.toString.contains("__gr_rt") &&
            !e.outputPartitioning.toString.contains("__gr_pid") &&
            !e.outputPartitioning.toString.contains("RoundRobin") &&
            e.child.collect {
              case a: BaseAggregateExec
                  if a.groupingExpressions.exists(
                    _.toString.contains("__gr_pid")) => a
            }.isEmpty => e
    }
    assert(offenders.isEmpty,
      s"corpus-wide group hash exchange found:\n${offenders.mkString("\n")}")
  }

  test("routing tokens invert Spark's shuffle hash: bucket b lands in " +
      "physical partition b") {
    // pins the murmur3(seed 42) + pmod contract routingTokens relies on;
    // a Spark-side hash change degrades balance only (correctness is
    // placement-independent), and this test is the tripwire
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash, Pmod}
    for (n <- Seq(1, 7, 32)) {
      val toks = Ranks.routingTokens(n)
      assert(toks.length == n)
      toks.zipWithIndex.foreach { case (t, b) =>
        val pid = Pmod(Murmur3Hash(Seq(Literal(t)), 42),
          Literal(n)).eval(null).asInstanceOf[Int]
        assert(pid == b, s"token $t for bucket $b routed to $pid (n=$n)")
      }
    }
  }

  test("boundary determinism: bucket ids agree across independent " +
      "evaluations of the same frame") {
    // the r13 silent-corruption shape: two branches disagreeing on the
    // row→partition map. With explicit boundaries the bucket id is a
    // pure function of the row — evaluate the SAME ranked pipeline
    // twice from scratch and require identical (id, rk) maps.
    val a = twoPass(corpus.repartition(13), parts = 5)
      .select("id", "rk", "cum").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val b = twoPass(corpus.repartition(3), parts = 5)
      .select("id", "rk", "cum").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(a == b)
  }

  test("RangeBucket has structural equality: independent instances over " +
      "equal boundaries are semanticEquals (exchange-reuse safe)") {
    import graft.functions.{RangeBoundaries, RangeBucket}
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.types.LongType
    def mk() = RangeBucket(
      Seq(AttributeReference("k", LongType)(
        org.apache.spark.sql.catalyst.expressions.ExprId(7))),
      new RangeBoundaries(Array(Array[Any](1L), Array[Any](5L))))
    assert(mk() == mk())                       // case-class equality
    assert(mk().semanticEquals(mk()))          // canonicalized equality
    val other = mk().copy(bounds =
      new RangeBoundaries(Array(Array[Any](2L))))
    assert(mk() != other)
    // and the searcher still buckets through the wrapper
    assert(mk().bounds.rows.length == 2)
    val lit = RangeBucket(Seq(Literal(3L)),
      new RangeBoundaries(Array(Array[Any](1L), Array[Any](5L))))
    assert(lit.eval(null) == 1) // one boundary <= 3
  }
}
