package graft.warehouse

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
  }

  test("compacts a fragmented table to the size target, data intact") {
    val root = Files.createTempDirectory("compact").toString
    val cat = new ParquetCatalog(spark, root)
    val df = (1 to 2000).map(i => (i.toLong, s"payload$i")).toDF("id", "v")
    cat.save("s", "t", df.repartition(32)) // 32 tiny files
    assert(dataFiles(cat.tablePath("s", "t")).size == 32)
    // huge target -> everything coalesces into one file
    val n = Compaction.compact(cat, spark, "s", "t", targetFileBytes = 1L << 30)
    assert(n == 1)
    assert(dataFiles(cat.tablePath("s", "t")).size == 1)
    assert(cat.load("s", "t").as[(Long, String)].collect().toSet ==
      (1 to 2000).map(i => (i.toLong, s"payload$i")).toSet)
  }

  test("target partitions follow on-disk bytes; byte sizing is data-only") {
    val root = Files.createTempDirectory("compact2").toString
    val cat = new ParquetCatalog(spark, root)
    cat.save("s", "t", (1 to 500).map(i => (i.toLong, i.toString))
      .toDF("id", "v").repartition(8))
    val bytes = Compaction.dataBytes(spark, cat.tablePath("s", "t"))
    assert(bytes > 0)
    // a target of a third of the table should ask for 3-4 files
    val n = Compaction.compact(cat, spark, "s", "t", bytes / 3)
    assert(n >= 3 && n <= 4)
    assert(Compaction.dataBytes(spark, "/nonexistent/path") == 0L)
    assert(Compaction.targetPartitions(0L, 100L) == 1)
    assert(Compaction.targetPartitions(101L, 100L) == 2)
  }

  test("splits oversized files too: target smaller than the scan splits") {
    val root = Files.createTempDirectory("compact4").toString
    val cat = new ParquetCatalog(spark, root)
    // ONE file; a coalesce-only implementation could never split it
    cat.save("s", "big", (1 to 4000).map(i => (i.toLong, s"v$i" * 10))
      .toDF("id", "v").coalesce(1))
    assert(dataFiles(cat.tablePath("s", "big")).size == 1)
    val bytes = Compaction.dataBytes(spark, cat.tablePath("s", "big"))
    val n = Compaction.compact(cat, spark, "s", "big", bytes / 4)
    assert(n >= 4)
    assert(dataFiles(cat.tablePath("s", "big")).size >= 4)
    assert(cat.load("s", "big").count() == 4000)
  }

  test("z-order compaction clusters both dimensions into few files") {
    val root = Files.createTempDirectory("compact3").toString
    val cat = new ParquetCatalog(spark, root)
    // 32x32 grid scattered across 16 random-ish files
    val grid = for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong)
    cat.save("s", "g", grid.toDF("x", "y").repartition(16))
    val bytes = Compaction.dataBytes(spark, cat.tablePath("s", "g"))
    Compaction.compact(cat, spark, "s", "g", bytes / 8,
      zorderCols = Seq("x", "y"), bits = 5)
    // a 8x8 box touches a bounded subset of files after clustering:
    // count distinct files containing box rows via input_file_name
    val boxFiles = cat.load("s", "g")
      .filter(col("x") < 8 && col("y") < 8)
      .select(input_file_name()).distinct().count()
    val allFiles = dataFiles(cat.tablePath("s", "g")).size
    assert(allFiles >= 6) // sizing actually split the table
    assert(boxFiles < allFiles) // the box does NOT touch every file
    assert(cat.load("s", "g").count() == 1024)
  }
}
