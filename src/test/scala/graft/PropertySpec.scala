package graft

import graft.core.Cdc
import graft.merge.CdcMerge
import graft.ops.TextOps
import graft.schema.TypeMapper
import graft.streaming.ControlPlane
import scala.util.Random

/** Property-style checks with seeded generation (SURVEY §5 port strategy:
  * randomized bounds + a model-based merge oracle; deterministic seed so
  * failures replay). */
class MergeModelSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side model of the SCD-1 merge: last writer per PK wins,
    * DELETE removes. */
  private def model(
      target: Map[Int, String],
      events: Seq[(Int, String, String)]): Map[Int, String] = {
    val lastPerPk = events.zipWithIndex
      .groupBy(_._1._1)
      .map { case (pk, evs) => pk -> evs.maxBy(_._2)._1 }
    lastPerPk.foldLeft(target) {
      case (acc, (pk, (_, op, v))) =>
        if (op == Cdc.OpDelete) acc - pk else acc.updated(pk, v)
    }
  }

  test("merge agrees with the sequential model on random C/U/D streams") {
    val rnd = new Random(42)
    val ops = Seq(Cdc.OpCreate, Cdc.OpUpdate, Cdc.OpDelete)
    for (round <- 1 to 12) {
      val events = Seq.fill(24)((
        rnd.nextInt(8) + 1,
        ops(rnd.nextInt(3)),
        "v" + rnd.nextInt(100)))
      val target = Map(1 -> "t1", 2 -> "t2", 3 -> "t3")
      val merged = CdcMerge.merge(
        target.toSeq.toDF("pk", "v"),
        events.zipWithIndex
          .map { case ((pk, op, v), i) => (i.toString, op, pk, v) }
          .toDF(Cdc.OffsetColumn, Cdc.OperationColumn, "pk", "v"),
        Seq("pk")).as[(Int, String)].collect().toMap
      assert(merged == model(target, events),
        s"round $round diverged; events=$events")
    }
  }
}

class BoundsPropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val rnd = new Random(7)

  test("varchar sizing always lands in [50 if masked else 1, 65535]") {
    for (_ <- 1 to 200) {
      val len = rnd.nextInt(100001)
      val masked = rnd.nextBoolean()
      val t = TypeMapper.warehouseType("string", "VARCHAR",
        if (len == 0) "" else len.toString, "", masked)
      val n = t.stripPrefix("character varying(").stripSuffix(")").toInt
      assert(n >= 1 && n <= 65535, s"len=$len masked=$masked -> $t")
      if (masked) assert(n >= 50)
    }
  }

  test("numeric precision/scale clamped to (38, 37)") {
    for (_ <- 1 to 200) {
      val (p, s) = (rnd.nextInt(100) + 1, rnd.nextInt(101))
      val t = TypeMapper.warehouseType("string", "DECIMAL", p.toString, s.toString)
      val Array(prec, scale) = t.stripPrefix("numeric(").stripSuffix(")")
        .split(',').map(_.toInt)
      assert(prec <= 38 && scale <= 37, s"p=$p s=$s -> $t")
    }
  }

  test("randomize stays within +/-pct for any base") {
    for (_ <- 1 to 500) {
      val base = rnd.nextLong(1000000L) + 1
      val pct = rnd.nextDouble() * 0.5
      val v = ControlPlane.randomize(base, pct)
      assert(v >= base - (base * pct).toLong, s"base=$base pct=$pct v=$v")
      assert(v <= base + (base * pct).toLong, s"base=$base pct=$pct v=$v")
    }
  }

  test("rollingHashScala is always in [0, 2^31-1)") {
    for (_ <- 1 to 500) {
      val s = rnd.nextString(rnd.nextInt(200))
      val h = TextOps.rollingHashScala(s)
      assert(h >= 0 && h < TextOps.RollingHashMod)
    }
  }

  test("chunkTopics partitions losslessly") {
    for (_ <- 1 to 100) {
      val topics = Seq.fill(rnd.nextInt(30))("t" + rnd.nextInt(1000))
      val n = rnd.nextInt(10) + 1
      val chunks = ControlPlane.chunkTopics(topics, n)
      assert(chunks.flatten == topics)
      assert(chunks.forall(_.size <= n))
    }
  }
}

/** Model-based check of the connected-components operator: Spark label
  * propagation must agree with a driver-side union-find on random graphs
  * (seeded — failures replay). */
class ClustersModelSpec extends SparkSpec {
  import graft.ops.Dedup
  import spark.implicits._

  private def model(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map((1L to n.toLong).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val minOfRoot = (1L to n.toLong).groupBy(find).map {
      case (root, members) => root -> members.min
    }
    (1L to n.toLong).map(i => i -> minOfRoot(find(i))).toMap
  }

  test("clusters agree with union-find on random graphs") {
    val rnd = new Random(11)
    for (round <- 1 to 6) {
      val n = 8 + rnd.nextInt(8)
      val edges = Seq.fill(rnd.nextInt(12)) {
        (rnd.nextInt(n) + 1L, rnd.nextInt(n) + 1L)
      }.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val got = Dedup.clusters(
        (1L to n.toLong).toDF("id0"), "id0",
        edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == model(n, edges), s"round $round edges=$edges")
    }
  }

  test("long chains converge within the iteration budget (pointer jumping)") {
    import org.apache.spark.sql.functions.col
    val n = 48
    val chain = (1L until n.toLong).map(i => (i, i + 1)) // path graph
    val got = Dedup.clusters(
      (1L to n.toLong).toDF("id0"), "id0",
      chain.toDF("id_a", "id_b"), maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L), s"unconverged: ${got.filter(_._2 != 1L)}")
  }

  test("portable h60: column form equals driver twin on random ASCII") {
    import graft.functions.Portable
    import org.apache.spark.sql.functions.col
    val rnd = new Random(13)
    val strs = Seq.fill(40)(
      rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    val got = strs.toDF("s")
      .select(Portable.h60(col("s"))).as[Long].collect().toSeq
    assert(got == strs.map(Portable.h60))
    assert(got.forall(h => h >= 0 && h < (1L << 60)))
  }
}

/** Model/property checks for the round-4 curation operators (seeded —
  * failures replay). */
class CurationModelSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.{Dedup, Sampling, Similarity}
  import org.apache.spark.sql.functions.col

  test("splitBy: exactly one split per row at any fractions (seeded)") {
    val rnd = new Random(7)
    for (_ <- 1 to 5) {
      val a = 0.5 + rnd.nextDouble() * 0.4
      val b = (1.0 - a) * rnd.nextDouble()
      val splits = Seq("x" -> a, "y" -> b, "z" -> (1.0 - a - b))
      val ids = (1 to 300).map(_.toLong).toDF("id")
      val got = Sampling.splitBy(ids, "id", splits)
        .select("id", "split").as[(Long, String)].collect()
      assert(got.length == 300 && got.map(_._1).distinct.length == 300)
      assert(got.map(_._2).toSet.subsetOf(Set("x", "y", "z")))
    }
  }

  test("weightedKeep is monotone in the weight (threshold nesting)") {
    val df = (1 to 400).map(i => (i.toLong, "d")).toDF("id", "src")
    def kept(w: Double) = Sampling.weightedKeep(df, "src", "id",
      Map("d" -> w), defaultWeight = 0.0)
      .select("id").as[Long].collect().toSet
    val w25 = kept(0.25); val w50 = kept(0.5); val w100 = kept(1.0)
    assert(w25.subsetOf(w50) && w50.subsetOf(w100))
    assert(w100.size == 400)
  }

  test("randomProject is invariant to row order and partitioning") {
    val rnd = new Random(11)
    val vecs = (1 to 60).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.randomProject(df, "id", "v", 4)
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val base = run(vecs.toDF("id", "v"))
    val shuffled = run(new Random(3).shuffle(vecs).toDF("id", "v")
      .repartition(7))
    assert(base == shuffled)
  }

  test("crossDocShingleFrac agrees with a driver-side model (seeded)") {
    val rnd = new Random(23)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val corpus = (1L to 30L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    // model: distinct word-3-grams per doc, df over docs, frac with df>=2
    val grams = corpus.map { case (id, t) =>
      id -> t.split(" ").sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    }.toMap
    val dfreq = grams.values.flatten.groupBy(identity).map {
      case (g, occ) => g -> occ.size }
    val expect = corpus.map { case (id, _) =>
      val g = grams(id)
      val dup = g.count(dfreq(_) >= 2)
      id -> ((g.size.toLong, dup.toLong))
    }.toMap
    val got = Dedup.crossDocShingleFrac(corpus.toDF("doc_id", "text"),
        "doc_id", "text", n = 3)
      .select("id", "n_shingles", "n_dup").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expect)
  }
}

/** Model-based SCD2 checks: random C/U/D version streams vs a driver-side
  * sequential model; invariants that must hold for ANY input. */
class Scd2ModelSpec extends SparkSpec {
  import graft.merge.Scd2
  import spark.implicits._

  private def df(events: Seq[(Int, Long, String, String)]) =
    events.toDF("pk", "ver", "v", Cdc.OperationColumn)

  test("random streams: interval chaining, <=1 current per pk, model agreement, split-merge equivalence") {
    val rnd = new scala.util.Random(4242)
    val ops = Seq(Cdc.OpCreate, Cdc.OpUpdate, Cdc.OpDelete)
    for (round <- 1 to 10) {
      // distinct versions (re-delivery handled in its own spec test)
      val vers = rnd.shuffle((1L to 40L).toList)
      val events = vers.map(ver =>
        (rnd.nextInt(6) + 1, ver, "v" + rnd.nextInt(100),
          ops(rnd.nextInt(3))))
      val hist = Scd2.build(df(events), Seq("pk"), "ver")
        .select("pk", "valid_from", "valid_to", "is_current", "v")
        .as[(Int, Long, Option[Long], Boolean, String)].collect().toSeq

      // driver-side model: per pk, sorted versions chain; deletes vanish
      val want = events.groupBy(_._1).toSeq.flatMap { case (pk, evs) =>
        val sorted = evs.sortBy(_._2)
        sorted.zip(sorted.drop(1).map(e => Some(e._2)) :+ None).collect {
          case ((_, ver, v, op), nxt) if op != Cdc.OpDelete =>
            (pk, ver, nxt, nxt.isEmpty, v)
        }
      }.toSet
      assert(hist.toSet == want, s"model mismatch in round $round")

      // invariants
      hist.groupBy(_._1).foreach { case (pk, rows) =>
        assert(rows.count(_._4) <= 1, s"pk $pk has >1 current row")
        rows.foreach { case (_, from, to, cur, _) =>
          assert(to.forall(_ > from))
          assert(cur == to.isEmpty)
        }
      }

      // incremental == one-shot at a random split point
      val (a, b) = events.sortBy(_._2).splitAt(rnd.nextInt(events.size))
      val inc = Scd2.merge(Scd2.build(df(a), Seq("pk"), "ver"), df(b),
        Seq("pk"), "ver")
        .select("pk", "valid_from", "valid_to", "is_current", "v")
        .as[(Int, Long, Option[Long], Boolean, String)].collect().toSet
      assert(inc == hist.toSet, s"split-merge drift in round $round")
    }
  }
}
