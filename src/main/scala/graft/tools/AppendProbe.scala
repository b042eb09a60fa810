package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bisects the SemDedupStream append job (~1 s/trigger, the r15/r16
  * trigger floor): how much is (a) the bare dynamic-partition parquet
  * write + committer, (b) the survivor anti-join algebra above it,
  * (c) the Observation metric. Prints one line per variant, min of 3.
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files
      .createTempDirectory("graft_appendprobe").toString
    val rnd = new scala.util.Random(7)
    // the stream's steady-state shape: ~2000 batch rows, 16 cells,
    // ~1000 survivors, pair frame of a few thousand rows
    val assigned = (0 until 2000).map { i =>
      (100000L + i, Array.fill(64)(rnd.nextFloat()), rnd.nextInt(16))
    }.toDF("vec_id", "embedding", "__bcell").localCheckpoint()
    val pairs = (0 until 3000).map { i =>
      val b = 100000L + rnd.nextInt(2000)
      val r = if (i % 3 == 2) 100000L + rnd.nextInt(2000) else rnd.nextInt(5000).toLong
      (b, r, Seq("c", "w", "g")(i % 3))
    }.toDF("__bid", "__rid", "__kind").localCheckpoint()

    def timeMin(n: Int)(body: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    def freshTarget(): String = {
      val p = dir + "/idx" + System.nanoTime()
      p
    }

    def writeOut(df: DataFrame, path: String): Unit =
      df.repartition(16, col("__bcell"))
        .withColumnRenamed("__bcell", "cell")
        .write.mode(SaveMode.Append).partitionBy("cell").parquet(path)

    // (a) bare write, no algebra
    val bare = timeMin(5) { writeOut(assigned, freshTarget()) }
    // (a2) bare write WITHOUT dynamic partitioning (single dir)
    val flat = timeMin(5) {
      assigned.repartition(16).write.mode(SaveMode.Append)
        .parquet(freshTarget())
    }
    // (a3) bare write, noop sink (no committer, no files)
    val noop = timeMin(5) {
      assigned.repartition(16, col("__bcell"))
        .write.format("noop").mode("overwrite").save()
    }
    // (b) the r15/r16 drops algebra + write
    val algebra = timeMin(5) {
      val corpusDrops = pairs.filter(col("__kind") === "c")
        .select(col("__bid").as("__drop"))
      val keepDrops = pairs.filter(col("__kind") === "w")
        .join(corpusDrops.select(col("__drop").as("__rid")),
          Seq("__rid"), "left_anti")
        .select(col("__bid").as("__drop"))
      val guardDrops = pairs.filter(col("__kind") === "g")
        .select(col("__bid").as("__drop"))
      val drops = corpusDrops.unionByName(keepDrops)
        .unionByName(guardDrops)
      writeOut(assigned.join(drops, col("vec_id") === col("__drop"),
        "left_anti"), freshTarget())
    }
    // (c) algebra + Observation (the shipped shape)
    val algebraObs = timeMin(5) {
      val corpusDrops = pairs.filter(col("__kind") === "c")
        .select(col("__bid").as("__drop"))
      val keepDrops = pairs.filter(col("__kind") === "w")
        .join(corpusDrops.select(col("__drop").as("__rid")),
          Seq("__rid"), "left_anti")
        .select(col("__bid").as("__drop"))
      val drops = corpusDrops.unionByName(keepDrops)
        .unionByName(pairs.filter(col("__kind") === "g")
          .select(col("__bid").as("__drop")))
      val obs = org.apache.spark.sql.Observation()
      writeOut(assigned.join(drops, col("vec_id") === col("__drop"),
        "left_anti").observe(obs, count(lit(1)).as("n")), freshTarget())
      obs.get.get("n")
      ()
    }
    // (d) driver-side drop set + isin filter + write (the candidate):
    // the pair frame is checkpointed and bounded, so reduce it driver-
    // side and make the append plan a pure filter over the checkpoint
    val driverSide = timeMin(5) {
      val rows = pairs.collect()
      val c = rows.filter(_.getString(2) == "c").map(_.getLong(0)).toSet
      val g = rows.filter(_.getString(2) == "g").map(_.getLong(0)).toSet
      val w = rows.filter(_.getString(2) == "w")
        .filter(r => !c.contains(r.getLong(1))).map(_.getLong(0)).toSet
      val drop = c ++ g ++ w
      writeOut(assigned.filter(!col("vec_id")
        .isInCollection(drop.toSeq)), freshTarget())
    }
    println(f"APPENDPROBE bare_write=$bare%.3f flat_write=$flat%.3f " +
      f"noop_write=$noop%.3f algebra=$algebra%.3f " +
      f"algebra_obs=$algebraObs%.3f driver_side=$driverSide%.3f")
    // (e) the REAL stream shape: repeated appends into ONE growing
    // target (file count grows 16/append) — does the write job pay an
    // O(existing files) cost per append?
    val grow = dir + "/grow"
    val times = (1 to 24).map { i =>
      val t0 = System.nanoTime()
      writeOut(assigned, grow)
      (System.nanoTime() - t0) / 1e9
    }
    println("APPENDPROBE_GROW " + times.zipWithIndex
      .map { case (t, i) => f"a$i=$t%.2f" }.mkString(" "))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir))
    spark.stop()
  }
}
