package graft.streaming

import graft.SparkSpec
import graft.functions.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming HLL == batch HLL over the same data; monotone emissions. */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private val P = 6 // small registers keep the spec fast

  test("stream-final sketch equals batch sketch; merged emissions too") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val out = SketchStream.hllByKey(
      mem.toDF().toDF("g", "k"), "g", col("k"), P)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("hllstream").start()
    try {
      // three triggers, overlapping keys (redelivery) across batches
      mem.addData((1 to 400).map(i => ("a", s"x$i")) ++
        (1 to 50).map(i => ("b", s"y$i")): _*)
      q.processAllAvailable()
      mem.addData((200 to 600).map(i => ("a", s"x$i")): _*)
      q.processAllAvailable()
      mem.addData((1 to 50).map(i => ("b", s"y$i")) ++
        (51 to 80).map(i => ("b", s"y$i")): _*)
      q.processAllAvailable()

      val emissions = spark.sql("SELECT g, hll FROM hllstream")
      // last emission per group == batch sketch over all the data
      val batchDf = ((1 to 600).map(i => ("a", s"x$i")) ++
        (1 to 80).map(i => ("b", s"y$i"))).toDF("g", "k")
      val expect = Sketches.hllSketch(batchDf, Seq("g"), col("k"), P)
        .as[(String, Seq[Int])].collect().toMap
      // merging ALL emissions (at-least-once replay shape) must also
      // equal the batch sketch — register-max is idempotent+monotone
      val mergedAll = Sketches.hllMergeAgg(emissions, Seq("g"), P)
        .as[(String, Seq[Int])].collect().toMap
      assert(mergedAll == expect)

      // and the per-group estimates are sane (~600 and ~80 distinct)
      val est = SketchStream.withEstimate(
          Sketches.hllMergeAgg(emissions, Seq("g"), P), P)
        .select("g", "est_distinct").as[(String, Double)].collect().toMap
      assert(math.abs(est("a") - 600) / 600.0 < 0.4, est("a"))
      assert(math.abs(est("b") - 80) / 80.0 < 0.4, est("b"))
    } finally q.stop()
  }

  test("streaming KMV == batch KMV over the same prefix; replay-merge safe") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val out = SketchStream.kmvByKey(
      mem.toDF().toDF("g", "k"), "g", col("k"), k = 16)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("kmvstream").start()
    try {
      mem.addData((1 to 300).map(i => ("a", s"x$i")) ++
        (1 to 40).map(i => ("b", s"y$i")): _*)
      q.processAllAvailable()
      // overlap across triggers: redelivered keys must not change sketches
      mem.addData((150 to 500).map(i => ("a", s"x$i")) ++
        (1 to 40).map(i => ("b", s"y$i")): _*)
      q.processAllAvailable()

      val emissions = spark.sql("SELECT g, kmv FROM kmvstream")
      val batchDf = ((1 to 500).map(i => ("a", s"x$i")) ++
        (1 to 40).map(i => ("b", s"y$i"))).toDF("g", "k")
      val expect = batchDf
        .groupBy("g")
        .agg(graft.functions.KmvAggExprs.kmvFromHashes(
          graft.functions.Portable.h60(col("k")), 16).as("kmv"))
        .as[(String, Seq[Long])].collect().toMap
      // the LAST emission per group equals the batch sketch
      val last = emissions.groupBy("g")
        .agg(graft.functions.KmvAggExprs.kmvUnion(col("kmv"), 16).as("kmv"))
        .as[(String, Seq[Long])].collect().toMap
      assert(last == expect)
      // sketches are bounded at k even though group a saw 500 distincts
      assert(expect("a").size == 16 && expect("b").size == 16)

      // live overlap tile: pairing the stream's final sketches through
      // kmvPairStats equals the batch overlap over the same data —
      // groups share no keys, so the estimate must be exactly 0; a
      // self-pair must be exactly 1
      val fin = last.toSeq.toDF("g", "kmv")
      val aSk = fin.filter(col("g") === "a").select(col("kmv").as("ka"))
      val bSk = fin.filter(col("g") === "b").select(col("kmv").as("kb"))
      val tile = aSk.crossJoin(bSk)
        .select(graft.ops.Dedup.kmvPairStats(
          col("ka"), col("kb"), 16).as("st"))
        .select("st.kmv_jaccard").as[Double].head
      assert(tile == 0.0)
      val self = aSk.select(graft.ops.Dedup.kmvPairStats(
          col("ka"), col("ka"), 16).as("st"))
        .select("st.kmv_jaccard").as[Double].head
      assert(self == 1.0)
    } finally q.stop()
  }
}
