package graft.functions

import graft.SparkSpec
import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** The portable (md5-derived) hash family must agree between its column
  * form (what the Spark plans compute) and its driver-side twin (what
  * plane/seed generation and the generated oracle SQL interpolate). */
class PortableSpec extends SparkSpec {
  import spark.implicits._

  test("h60 column form equals the driver-side twin") {
    val strs = Seq("abc", "", "p_0_5", "the quick brown fox", "Ümläut")
    val got = strs.toDF("s").select(Portable.h60(col("s"))).as[Long].collect()
    assert(got.toSeq == strs.map(Portable.h60))
  }

  test("known value: first 15 md5 hex chars of 'abc'") {
    // md5("abc") = 900150983cd24fb0... -> 0x900150983cd24fb
    assert(Portable.h60("abc") == 648541476951500027L)
  }

  test("portable planes are deterministic and in [-1, 1)") {
    val p1 = Similarity.portablePlanes(4, 8)
    val p2 = Similarity.portablePlanes(4, 8)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    assert(p1.flatten.forall(w => w >= -1.0 && w < 1.0))
  }

  test("portable minhash finds the exact near-duplicate pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
      (3L, "completely different words nothing shared here at all")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minHashCandidatesPortable(docs, "doc_id", "text",
        n = 3, numHashes = 64, bands = 16, estThreshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("portable simhash: near-dups close in Hamming, 60-bit signatures") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "unrelated content entirely disjoint vocabulary set")
    ).toDF("doc_id", "text")
    val sigs = Dedup.simHashSignaturesPortable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sigs.values.forall(s => s >= 0 && s < (1L << 60)))
    val pairs = Dedup.simHashCandidatesPortable(docs, "doc_id", "text",
        chunks = 4, maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }
}
