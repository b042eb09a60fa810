package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Catalyst's runtime bloom-filter injection (InjectRuntimeFilter): on a
  * shuffle join whose build side carries a selective filter, the
  * optimizer aggregates a bloom filter over the build keys and installs
  * `might_contain` on the probe side BEFORE its shuffle — at 100 TB this
  * is the difference between shuffling the whole fact table and
  * shuffling the ~matching fraction. The engine gets this for free
  * because every operator here is a declarative plan; this spec pins the
  * conditions under which it fires so a future config regression is
  * caught (thresholds are session confs a deployment must size).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects might_contain on the fact side") {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // local fixtures are tiny: drop the size gates so the rule considers
    // them (prod keeps the defaults — the gates ARE the sizing policy)
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join

    val dir = Files.createTempDirectory("rtfilter").toString
    s.range(100000).select(col("id").as("k"),
        (col("id") % 1000).as("payload"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    s.range(10000).select(col("id").as("k"), (col("id") % 50).as("cat"))
      .write.mode("overwrite").parquet(s"$dir/dim")

    val fact = s.read.parquet(s"$dir/fact")
    val dim = s.read.parquet(s"$dir/dim").filter(col("cat") === 7)
    val joined = fact.join(dim, "k")

    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain"),
      s"no bloom runtime filter injected:\n$optimized")

    // and it must not change results vs the unfiltered-plan session
    val expect = spark.read.parquet(s"$dir/fact")
      .join(spark.read.parquet(s"$dir/dim").filter(col("cat") === 7), "k")
      .count()
    assert(joined.count() == expect)
  }
}
