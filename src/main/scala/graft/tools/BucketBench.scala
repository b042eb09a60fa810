package graft.tools
import graft.core.Cdc
import graft.warehouse.{BucketedCatalog, MergeOnReadCatalog, ParquetCatalog}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantify the bucketed-store merge premise across TARGET sizes: plain
  * rewrites O(target) per merge, bucketed rewrites O(affected buckets) —
  * so bucketed must win once the target dwarfs the batch and the batch's
  * keys concentrate in few buckets. The r9 numbers (400k-row target)
  * showed bucketed LOSING everywhere because per-bucket constants
  * dominate at that size; this bench scales the target 400k → 4M → 40M
  * at a fixed 10k-row batch until the crossover appears (or doesn't),
  * in both key shapes (localized to 4/64 buckets vs uniform across all).
  * MOR rides along as the O(batch) control. Results → BENCHNOTES.md +
  * the store-selection guidance in warehouse/BucketedCatalog.scala.
  *
  * Also asserts the untouched-bucket invariant at the largest localized
  * size: bucket directories the batch does not touch keep their exact
  * file listing (names, sizes, mtimes).
  *
  * Usage: `runMain graft.tools.BucketBench [rows,rows,...]`
  * (default 400000,4000000,40000000).
  */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args(0).split(",").map(_.trim.toLong).toSeq
      else Seq(400000L, 4000000L, 40000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nB = 64
    val batchRows = 10000
    val nRuns = 2

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def rm(dir: String): Unit = {
      def go(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(go)); f.delete(); ()
      }
      go(new java.io.File(dir))
    }

    // same shape as Bench.scala's storeMerge section so numbers compare
    def target(rows: Long) = spark.range(rows).selectExpr(
      "cast(id as string) as id", "concat('n', id) as name",
      "cast(id * 7 as string) as v")
    def stageOf(rows: Long, localized: Boolean) = {
      val ids =
        if (localized) spark.range(rows)
          .selectExpr("cast(id as string) as id")
          .filter(BucketedCatalog.bucketExpr(Seq("id"), nB) < 4)
          .limit(batchRows)
        else spark.range(batchRows.toLong).selectExpr(
          s"cast(id * ${rows / batchRows} as string) as id")
      ids.selectExpr("id", "concat('upd', id) as name",
          "cast(id * 11 as string) as v",
          s"cast(id as long) as ${Cdc.OffsetColumn}",
          s"'${Cdc.OpUpdate}' as ${Cdc.OperationColumn}")
        .cache()
    }

    // warm up codegen/IO paths so the first table row isn't JIT noise
    {
      val tmp = java.nio.file.Files.createTempDirectory("bbw").toString
      val w = new ParquetCatalog(spark, s"$tmp/w")
      w.save("s", "t", target(10000))
      val st = stageOf(10000, localized = false)
      w.merge("s", "t", st, Seq("id"))
      st.unpersist(); rm(tmp)
    }

    println(f"${"target_rows"}%12s ${"keys"}%10s ${"plain_s"}%8s " +
      f"${"bucketed_s"}%10s ${"mor_s"}%7s ${"bkt_speedup"}%12s")
    for (rows <- sizes; localized <- Seq(true, false)) {
      val tmp = java.nio.file.Files.createTempDirectory("bb").toString
      val st = stageOf(rows, localized)
      st.count()
      val tgt = target(rows)

      val plain = new ParquetCatalog(spark, s"$tmp/plain")
      plain.save("s", "t", tgt)
      val tPlain = (1 to nRuns)
        .map(_ => time(plain.merge("s", "t", st, Seq("id")))).min

      val bucketed = new BucketedCatalog(spark, s"$tmp/bucketed", nB)
      bucketed.save("s", "t", tgt, Seq("id"))
      // untouched-bucket invariant, checked at the largest localized size
      val checkInvariant = localized && rows == sizes.max
      val affected = st
        .withColumn("b", BucketedCatalog.bucketExpr(Seq("id"), nB))
        .select("b").distinct().as[Int].collect().toSet
      val fs = new Path(tmp).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      def listing(): Map[String, (Long, Long)] =
        bucketed.buckets("s", "t").filterNot(affected)
          .flatMap { b =>
            val dir = new Path(s"$tmp/bucketed/s/t/bucket=$b")
            fs.listStatus(dir).map(stt =>
              stt.getPath.toString -> (stt.getLen, stt.getModificationTime))
          }.toMap
      val before =
        if (checkInvariant) listing() else Map.empty[String, (Long, Long)]
      val tBucketed = (1 to nRuns)
        .map(_ => time(bucketed.merge("s", "t", st, Seq("id")))).min
      if (checkInvariant) {
        val after = listing()
        require(before == after && before.nonEmpty,
          s"untouched-bucket invariant violated: ${before.size} files " +
            s"before, ${after.size} after")
      }

      // compactEvery above nRuns: timed merges stay pure O(batch) appends
      val mor = new MergeOnReadCatalog(spark, s"$tmp/mor",
        compactEvery = nRuns + 2)
      mor.merge("s", "t", tgt.selectExpr("id", "name", "v",
        s"cast(id as long) as ${Cdc.OffsetColumn}",
        s"'${Cdc.OpCreate}' as ${Cdc.OperationColumn}"), Seq("id"))
      val tMor = (1 to nRuns)
        .map(_ => time(mor.merge("s", "t", st, Seq("id")))).min

      val keys = if (localized) s"local(${affected.size}/$nB)" else "uniform"
      println(f"$rows%12d $keys%10s $tPlain%8.2f $tBucketed%10.2f " +
        f"$tMor%7.2f ${tPlain / tBucketed}%11.1fx")
      st.unpersist(); rm(tmp)
    }
    println(s"(batch=$batchRows update rows, nBuckets=$nB, min of $nRuns " +
      "merges per cell; untouched-bucket listings asserted unchanged at " +
      "the largest localized size)")
    spark.stop()
  }
}
