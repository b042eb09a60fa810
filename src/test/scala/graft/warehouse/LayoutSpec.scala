package graft.warehouse

import graft.SparkSpec
import graft.core.{ColSpec, SourceType, TableSpec}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private val spec = TableSpec("s", "t", Seq(
    ColSpec("k", "int32", SourceType("INT"), distKey = true),
    ColSpec("ts", "long", SourceType("BIGINT"), sortOrdinal = 1),
    ColSpec("v", "string", SourceType("VARCHAR", "10"))))

  test("M9 arrange: hash partition on distkey, sorted within partitions") {
    val df = (1 to 100).map(i => (i % 5, (100 - i).toLong, s"v$i"))
      .toDF("k", "ts", "v")
    val arranged = Layout.arrange(df, spec, 4)
    assert(arranged.rdd.getNumPartitions == 4)
    // same k always lands in the same partition
    val placements = arranged
      .select(col("k"), spark_partition_id().as("p"))
      .distinct().groupBy("k").count().select("count").as[Long].collect()
    assert(placements.forall(_ == 1L))
    // sorted by ts within each partition
    val perPart = arranged.select(spark_partition_id().as("p"), col("ts"))
      .collect().groupBy(_.getInt(0)).values
    assert(perPart.forall { rows =>
      val ts = rows.map(_.getLong(1)).toSeq
      ts == ts.sorted
    })
  }

  test("plan shows hashpartitioning on the dist column") {
    val df = Seq((1, 2L, "a")).toDF("k", "ts", "v")
    val plan = Layout.arrange(df, spec, 4).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(k"), plan)
  }

  /** Driver-side model of the z-curve interleave. */
  private def zModel(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    vals.zipWithIndex.flatMap { case (v, ci) =>
      (0 until bits).map(j => (((v & ((1L << bits) - 1)) >> j) & 1L) << (j * n + ci))
    }.reduce(_ | _)
  }

  test("zValue agrees with the bit-interleave model") {
    val data = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L),
      (5L, 9L), (700L, 31L), (4096L + 5L, 9L)) // masking: 4101 ≡ 5 mod 2^10
    val out = data.toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 10).as("z"))
      .as[Long].collect().toSeq
    assert(out == data.map { case (x, y) => zModel(Seq(x, y), 10) })
    // x occupies even bit positions: (1,0) -> 1, (0,1) -> 2
    assert(zModel(Seq(1L, 0L), 10) == 1L && zModel(Seq(0L, 1L), 10) == 2L)
  }

  test("z-order clusters a 2-D box into fewer files than a linear sort") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    // deterministic scatter over the 1024x1024 grid
    val df = (0 until 8192).map { i =>
      (i.toLong, (i * 7919L) % 1024, (i * 104729L) % 1024)
    }.toDF("id", "x", "y")
    val files = 16
    Layout.zorder(df, Seq(col("x"), col("y")), files, bits = 10)
      .write.parquet(s"$dir/z")
    df.repartitionByRange(files, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/linear")
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("x") < 256 && col("y") < 256)
        .select(input_file_name()).distinct().count()
    val (zf, lf) = (filesTouched(s"$dir/z"), filesTouched(s"$dir/linear"))
    // the box is 1/16 of the plane: z-order confines its rows to a
    // handful of files; a linear x-sort spreads them across every file
    // of the x stripe (y unconstrained)
    assert(zf < lf, s"z-order touched $zf files, linear $lf")
    assert(zf <= files / 4, s"z-order touched $zf of $files files")
  }
}
