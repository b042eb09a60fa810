package graft.tools
import graft.core.Cdc
import graft.warehouse.{BucketedCatalog, ParquetCatalog}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantify the bucketed-store merge advantage: small CDC batch into a
  * 600k-row target, plain full-rewrite vs affected-buckets rewrite. */
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
    println(s"target rows: ${li.count()}")

    val stage = (1 to 100).map(i => (i.toString, Cdc.OpUpdate, i * 997L, s"u$i"))
      .toDF(Cdc.OffsetColumn, Cdc.OperationColumn, "pk", "v")

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }

    val tmp = java.nio.file.Files.createTempDirectory("bb").toString
    val plain = new ParquetCatalog(spark, s"$tmp/plain")
    plain.save("s", "t", li)
    val tPlain = time(plain.merge("s", "t", stage, Seq("pk")))

    val bucketed = new BucketedCatalog(spark, s"$tmp/bucketed", 64)
    bucketed.save("s", "t", li, Seq("pk"))
    val tBucketed = time(bucketed.merge("s", "t", stage, Seq("pk")))

    println(f"BUCKETBENCH plain_full_rewrite=$tPlain%.2fs bucketed=$tBucketed%.2fs speedup=${tPlain / tBucketed}%.1fx")
    spark.stop()
  }
}
