package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Algebraic laws of the round-9 cleanup operators, checked over seeded
  * random inputs (failures replay deterministically). */
class Round9PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260814)

  test("canonicalUrl is idempotent on random URLs") {
    val hosts = Seq("A.com", "sub.Ex.ORG", "x.io")
    val params = Seq("utm_source=a", "id=9", "gclid=z", "q=Hello",
      "utm_b=c", "fbclid=1", "page=2")
    val urls = (1 to 200).map { _ =>
      val ps = rnd.shuffle(params).take(rnd.nextInt(4))
      val frag = if (rnd.nextBoolean()) "#sec" else ""
      s"https://${hosts(rnd.nextInt(3))}/P${rnd.nextInt(9)}" +
        (if (ps.isEmpty) "" else ps.mkString("?", "&", "")) + frag
    }
    val once = urls.toDF("u").select(Web.canonicalUrl(col("u")).as("c"))
    val twice = once.select(Web.canonicalUrl(col("c")).as("c2"))
    val pairs = once.collect().map(_.getString(0))
      .zip(twice.collect().map(_.getString(0)))
    pairs.foreach { case (a, b) => assert(a == b, s"not idempotent: $a") }
    // and no canonical URL retains a tracker or fragment
    pairs.foreach { case (a, _) =>
      assert(!a.contains("utm_") && !a.contains("clid") && !a.contains("#"))
    }
  }

  test("boilerplate strip is idempotent (second pass is identity)") {
    val sites = Seq("a", "b", "c")
    val docs = (1L to 60L).map { i =>
      val site = sites((i % 3).toInt)
      val lines = Seq(s"nav-$site") ++ // per-site furniture
        (if (i % 7 == 0) Seq("promo") else Nil) ++
        Seq(s"body-$i", s"tail-${i % 5}")
      (i, site, lines.mkString("\n"))
    }.toDF("id", "site", "text")
    // re-key: strip output lacks the site column — join it back
    val reKeyed = Boilerplate.strip(docs, "id", "site", "text")
      .join(docs.select(col("id"), col("site")), "id")
      .select(col("id"), col("site"), col("clean_text").as("text"))
    val twice = Boilerplate.strip(reKeyed, "id", "site", "text")
    val a = reKeyed.orderBy("id").select("id", "text")
      .as[(Long, String)].collect().toSeq
    val b = twice.orderBy("id").select("id", "clean_text")
      .as[(Long, String)].collect().toSeq
    assert(a == b)
  }

  test("tokenizeToIds conserves counts: n_oov <= n_tokens == input tokens") {
    val docs = (1L to 40L).map { i =>
      (i, (1 to rnd.nextInt(20)).map(_ => s"w${rnd.nextInt(30)}")
        .mkString(" "))
    }.toDF("id", "t")
    val r = TextOps.tokenizeToIds(docs, "id", "t", vocabSize = 10)
      .as[(Long, String, Long, Long)].collect()
    r.foreach { case (_, ids, n, oov) =>
      assert(oov <= n)
      assert((if (ids.isEmpty) 0 else ids.split(" ").length.toLong) == n)
    }
  }

  test("fastSigmoid: sigma(z) + sigma(-z) == 1 within an ulp") {
    val zs = (1 to 100).map(_ => rnd.nextDouble() * 20 - 10)
    val df = zs.toDF("z")
    val r = df.select(QualityModel.fastSigmoid(col("z")),
      QualityModel.fastSigmoid(-col("z"))).as[(Double, Double)].collect()
    r.foreach { case (p, q) =>
      assert(math.abs(p + q - 1.0) <= math.ulp(1.0), s"$p + $q")
    }
  }
}
