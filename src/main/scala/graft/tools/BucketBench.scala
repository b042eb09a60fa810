package graft.tools
import graft.core.Cdc
import graft.warehouse.{BucketedCatalog, ParquetCatalog}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantify the bucketed-store merge advantage across target sizes: a
  * small CDC batch (100 rows) merged into targets of growing size, plain
  * full-rewrite vs affected-buckets rewrite. Prints a crossover table
  * (results recorded in COVERAGE.md) and asserts the untouched-bucket
  * invariant at the largest size: bucket directories the batch does not
  * touch must keep their exact file listing (same names, sizes, mtimes).
  */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(monotonically_increasing_id().as("pk"),
        col("l_returnflag").as("v")).cache()
    val total = li.count()

    def mkStage(batch: Int) =
      (1 to batch).map(i => (i.toString, Cdc.OpUpdate, i * 997L, s"u$i"))
        .toDF(Cdc.OffsetColumn, Cdc.OperationColumn, "pk", "v")

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }

    // warm up codegen/IO paths so the first table row isn't JIT noise
    {
      val tmp = java.nio.file.Files.createTempDirectory("bbw").toString
      val w = new ParquetCatalog(spark, s"$tmp/w")
      w.save("s", "t", li.sample(0.01, seed = 1))
      w.merge("s", "t", mkStage(5), Seq("pk"))
    }

    println(f"${"target_rows"}%12s ${"batch"}%6s ${"buckets_hit"}%12s " +
      f"${"plain_s"}%8s ${"bucketed_s"}%10s ${"speedup"}%8s")
    for (batch <- Seq(5, 100); frac <- Seq(0.33, 1.0)) {
      val stage = mkStage(batch)
      val target = (if (frac >= 1.0) li else li.sample(frac, seed = 7)).cache()
      val n = target.count()
      val tmp = java.nio.file.Files.createTempDirectory("bb").toString
      val plain = new ParquetCatalog(spark, s"$tmp/plain")
      plain.save("s", "t", target)
      val tPlain = time(plain.merge("s", "t", stage, Seq("pk")))

      val bucketed = new BucketedCatalog(spark, s"$tmp/bucketed", 64)
      bucketed.save("s", "t", target, Seq("pk"))

      val affected = stage
        .withColumn("b", BucketedCatalog.bucketExpr(Seq("pk"), 64))
        .select("b").distinct().as[Int].collect().toSet
      val fs = new Path(tmp).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // snapshot untouched buckets (full sf only, keeps runtime low)
      def listing(): Map[String, (Long, Long)] =
        bucketed.buckets("s", "t").filterNot(affected)
          .flatMap { b =>
            val dir = new Path(s"$tmp/bucketed/s/t/bucket=$b")
            fs.listStatus(dir).map(st =>
              st.getPath.toString -> (st.getLen, st.getModificationTime))
          }.toMap
      val before = if (frac >= 1.0) listing() else Map.empty[String, (Long, Long)]

      val tBucketed = time(bucketed.merge("s", "t", stage, Seq("pk")))

      if (frac >= 1.0) {
        val after = listing()
        require(before == after && before.nonEmpty,
          s"untouched-bucket invariant violated: ${before.size} files before, " +
            s"${after.size} after")
      }
      println(f"$n%12d $batch%6d ${affected.size}%9d/64 " +
        f"$tPlain%8.2f $tBucketed%10.2f ${tPlain / tBucketed}%7.1fx")
      target.unpersist()
    }
    println(s"(target=lineitem sf0.1, $total rows; nBuckets=64; " +
      "untouched-bucket file listings asserted unchanged at full size)")
    spark.stop()
  }
}
