package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Writer-epoch fail-fast (VERDICT r18 What's wrong #2): the
  * single-writer contract used to be prose only — an out-of-band
  * writer silently invalidated the driver bloom and the memoized
  * Meta, and the failure mode was MISSED DUPLICATES (it measurably
  * bit the minhashdup harness draft). Every append/compact now bumps
  * a `_graft_writer` token; a stale instance's next mutation or
  * snapshot crashes with a named error instead. */
class StreamStoreWriterSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("ssw").toString

  test("a second instance's append crashes the first instance's next mutation with the named error") {
    val dir = tmp()
    val s1 = new StreamStore(spark, dir + "/s", "L1")
    s1.append(Seq("a", "b").toDF("key"), 0L)
    // takeover: a FRESH instance adopts the on-disk token and becomes
    // the writer (the legitimate restart path)
    val s2 = new StreamStore(spark, dir + "/s", "L2")
    s2.append(Seq("c").toDF("key"), 0L)
    // the STALE instance is the one that fails — its bloom/Meta no
    // longer cover s2's rows, so proceeding would miss duplicates
    val e = intercept[StreamStore.ConcurrentWriterException] {
      s1.append(Seq("d").toDF("key"), 1L)
    }
    assert(e.getMessage.contains("another instance"))
    // and s2, the current writer, keeps working; the stale append's
    // row never landed (the check precedes the data write)
    s2.append(Seq("e").toDF("key"), 1L)
    assert(s2.visible(2L).get.select("key").as[String].collect().sorted
      .toSeq == Seq("a", "b", "c", "e"))
  }

  test("a second instance's compact crashes the first instance's next snapshot load") {
    val dir = tmp()
    val s1 = new StreamStore(spark, dir + "/s", "L", 8, "key")
    s1.append(Seq("a", "b", "a").toDF("key"), 0L)
    val s2 = new StreamStore(spark, dir + "/s", "L", 8, "key")
    s2.compact(_.groupBy("key", "lineage")
      .agg(min("batch_id").as("batch_id")))
    // s1's own append invalidated its Meta; the next snapshot load
    // (dataBytes here — the first thing a trigger reads) sees the
    // foreign token. Detection latency is ≤ one trigger.
    intercept[StreamStore.ConcurrentWriterException] {
      s1.append(Seq("c").toDF("key"), 1L)
    }
  }

  test("happy path: one instance's own append/compact cycle never trips the check, and costs no extra meta loads") {
    val dir = tmp()
    val s = new StreamStore(spark, dir + "/s", "L", 8, "key")
    s.append(Seq("a", "b").toDF("key"), 0L)
    s.append(Seq("c").toDF("key"), 1L)
    s.compact(_.groupBy("key", "lineage")
      .agg(min("batch_id").as("batch_id")))
    s.append(Seq("d").toDF("key"), 2L)
    assert(s.visible(3L).get.select("key").as[String].collect().sorted
      .toSeq == Seq("a", "b", "c", "d"))
    // fs budget: the token rides the memoized Meta at load time and a
    // single small-file read per mutation — snapshot loads stay one
    // per mutation epoch (4 mutations + the first lazy load)
    assert(s.metaLoads <= 5L, s"metaLoads=${s.metaLoads}")
  }

  test("legacy tokenless store: adopted silently, first append starts the token") {
    val dir = tmp()
    val s0 = new StreamStore(spark, dir + "/s", "L")
    s0.append(Seq("a").toDF("key"), 0L)
    // simulate a pre-r19 store: drop the token file
    val f = new java.io.File(dir + "/s/_graft_writer")
    assert(f.exists); assert(f.delete())
    val s1 = new StreamStore(spark, dir + "/s", "L")
    assert(s1.exists) // adopt: no token, no error
    s1.append(Seq("b").toDF("key"), 1L)
    assert(new java.io.File(dir + "/s/_graft_writer").exists,
      "first append must start the token")
    assert(s1.visible(2L).get.count() == 2L)
  }

  test("corrupt bucket marker: readers fall back unpruned, appends stay in the delta leg, compact heals the layout (ADVICE r18 #1)") {
    val dir = tmp()
    val s = new StreamStore(spark, dir + "/s", "L", 8, "key")
    s.append(Seq("a", "b", "c", "d").toDF("key"), 0L)
    s.compact(_.groupBy("key", "lineage")
      .agg(min("batch_id").as("batch_id")))
    // zero-byte marker = the crash window between create and write
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "s", "_graft_buckets"),
      Array.empty[Byte])
    val r = new StreamStore(spark, dir + "/s", "L", 8, "key")
    // tolerant parse: no NPE; unknown layout reads unpruned but CORRECT
    assert(r.activeBuckets == 0)
    assert(r.visible(1L).get.select("key").as[String].collect().sorted
      .toSeq == Seq("a", "b", "c", "d"))
    assert(r.visiblePruned(1L, Seq(0)).get.count() == 4L,
      "pruned probe must fall back to the full read, never mis-prune")
    // append with an unreadable marker must NOT fork the store flat:
    // rows land in _delta, and no wrong marker is written
    r.append(Seq("e").toDF("key"), 1L)
    val names = new java.io.File(dir + "/s").listFiles().map(_.getName)
    assert(names.contains("_delta"), names.mkString(","))
    assert(r.visible(2L).get.count() == 5L)
    // compact rewrites the layout and restores a readable marker
    r.compact(_.groupBy("key", "lineage")
      .agg(min("batch_id").as("batch_id")))
    val healed = new StreamStore(spark, dir + "/s", "L", 8, "key")
    assert(healed.activeBuckets > 0, "compact must heal the marker")
    assert(healed.visible(2L).get.count() == 5L)
  }
}
