package graft.ops

import graft.SparkSpec

class BpeBatchSpec extends SparkSpec {
  import spark.implicits._

  private def table(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("batched trainer == strict trainer, merge for merge") {
    val docs = Seq(
      "the cat sat on the mat", "the bat and the cat chat",
      "that hat on that cat", "a rat sat on a mat and a hat",
      "mats and hats and rats and cats", "banana bandana ananas",
      "the theme then there these", "chatter scatter matter batter")
      .toDF("text")
    for (m <- Seq(1, 8, 24); n <- Seq(1, 4, 64)) {
      val strict = table(TextOps.bpeTrain(docs, "text", m))
      val batched = table(TextOps.bpeTrainBatched(docs, "text", m,
        batchN = n))
      assert(batched == strict, s"merges=$m batchN=$n")
    }
  }

  test("batched == strict on an adversarial alternation corpus") {
    // runs of one pair ("aaaa…" with merge (a,a)) plus interleaved
    // symbol-sharing pairs — the shapes the hazard rule exists for:
    // created pairs (x,aa) can tie changed pairs and win on (l,r) order
    val docs = Seq(
      "aaaaaa aaaa aa", "abababab abab", "aab aba baa",
      "xaay yaax aaxy", "zz zzz zzzz zzzzz")
      .toDF("text")
    for (m <- Seq(4, 12)) {
      val strict = table(TextOps.bpeTrain(docs, "text", m))
      val batched = table(TextOps.bpeTrainBatched(docs, "text", m,
        batchN = 8))
      assert(batched == strict, s"merges=$m")
    }
  }

  test("self-pair acceptance folds its own count into the hazard") {
    // r16-verdict repro: 2x'aaaaaa' + 3x'xy'. Round 1 candidates are
    // [(a,a,10), (x,y,3)]; (a,a) is a SELF-PAIR whose created pairs
    // ((aa,a)/(a,aa)/(aa,aa), count 4 here) are bounded only by its
    // own pc=10 — no other candidate shares a symbol. Without the
    // self-pair hazard the disjoint (x,y,3) is accepted even though
    // strict order picks the created pair (count 4 > 3) next.
    val docs = Seq("aaaaaa", "aaaaaa", "xy", "xy", "xy").toDF("text")
    for (m <- Seq(2, 3, 6); n <- Seq(4, 64)) {
      val strict = table(TextOps.bpeTrain(docs, "text", m))
      val batched = table(TextOps.bpeTrainBatched(docs, "text", m,
        batchN = n))
      assert(batched == strict, s"merges=$m batchN=$n")
    }
    // the same shape buried among disjoint high-count pairs: the
    // non-self merges before and after the self-pair must still batch
    val mixed = Seq(
      "pq pq pq pq pq pq pq pq", "aaaaaa aaaaaa", "uv uv uv uv",
      "mn mn mn").toDF("text")
    for (m <- Seq(4, 8)) {
      val strict = table(TextOps.bpeTrain(mixed, "text", m))
      val batched = table(TextOps.bpeTrainBatched(mixed, "text", m,
        batchN = 8))
      assert(batched == strict, s"mixed merges=$m")
    }
  }

  test("batched trainer exhausts cleanly when pairs run out") {
    val docs = Seq("ab", "ab", "cd").toDF("text")
    // only pairs (a,b) and (c,d) exist; asking for 10 merges stops at 2
    val got = table(TextOps.bpeTrainBatched(docs, "text", 10))
    assert(got.map(t => (t._2, t._3)) == Seq("a" -> "b", "c" -> "d"))
    assert(got == table(TextOps.bpeTrain(docs, "text", 10)))
  }
}
