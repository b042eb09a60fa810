package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the MOR delta-chain read surcharge that
  * [[graft.warehouse.MergeOnReadCatalog]]'s byte-ratio compaction policy
  * is calibrated against: resolved-read wall time and live bytes as the
  * un-compacted chain grows.
  *
  * Usage: `runMain graft.tools.MorReadAmp [targetRows] [batchRows]`
  * (defaults 400k / 10k — the Bench store-merge shape). Prints one line
  * per chain length: deltas, delta/base bytes, measured ratio, and the
  * warm min read wall, plus the compacted-base read wall as the floor.
  */
object MorReadAmp {
  def main(args: Array[String]): Unit = {
    val targetRows = if (args.length > 0) args(0).toLong else 400000L
    val batchRows = if (args.length > 1) args(1).toLong else 10000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.Cdc
    val dir = java.nio.file.Files.createTempDirectory("graft-moramp").toString
    // count/ratio triggers disabled: this tool measures the UNcompacted
    // chain the policy exists to bound
    val mor = new graft.warehouse.MergeOnReadCatalog(spark, dir,
      compactEvery = Int.MaxValue, ratioFloorBytes = Long.MaxValue)
    def stage(seed: Long, n: Long) = spark.range(n).selectExpr(
      s"cast((id * 37 + $seed) % $targetRows as string) as id",
      s"concat('v', id, '_', $seed) as name",
      "cast(id * 11 as string) as v",
      s"cast(id + $seed as long) as ${Cdc.OffsetColumn}",
      s"'${Cdc.OpUpdate}' as ${Cdc.OperationColumn}")
    mor.merge("s", "t", spark.range(targetRows).selectExpr(
      "cast(id as string) as id", "concat('n', id) as name",
      "cast(id * 7 as string) as v",
      s"cast(id as long) as ${Cdc.OffsetColumn}",
      s"'${Cdc.OpCreate}' as ${Cdc.OperationColumn}"), Seq("id"))
    def readSec(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mor.load("s", "t").write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"deltas=0 deltaBytes=0 baseBytes=" +
      f"${mor.readAmplification("s", "t")._2} ratio=0.000 readSec=" +
      f"${readSec()}%.3f  (compacted floor)")
    var seq = 0L
    for (chain <- Seq(1, 2, 4, 8, 16, 32)) {
      while (mor.deltaCount("s", "t") < chain) {
        mor.merge("s", "t", stage(seq, batchRows), Seq("id"))
        seq += 1
      }
      val (db, bb) = mor.readAmplification("s", "t")
      println(f"deltas=$chain deltaBytes=$db baseBytes=$bb " +
        f"ratio=${db.toDouble / bb}%.3f readSec=${readSec()}%.3f")
    }
    spark.stop()
  }
}
