package graft.warehouse

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CoLocatedSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).size

  // executes (AQE finalizes its plan on execution) and renders the
  // executed tree — toString descends into AdaptiveSparkPlanExec, which
  // TreeNode.collect does not
  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan.toString
  }

  test("co-bucketed join and aggregation plan with zero Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("colocated").toString
    val cat = new CoLocated(spark, "colo_test")
    cat.init(dir)
    val facts = (1 to 5000).map(i => (i.toLong % 500, s"f$i", i * 1.0))
      .toDF("k", "tag", "v")
    val dims = (0L until 500L).map(i => (i, s"d$i")).toDF("k", "name")
    try {
      cat.save("facts", facts, Seq("k"), nBuckets = 8)
      cat.save("dims", dims, Seq("k"), nBuckets = 8)

      // un-bucketed baseline: the same join shuffles both sides
      val baseline = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val unbucketed = executed(facts.join(dims, Seq("k")))
        assert(exchanges(unbucketed) == 2)

        // co-located join: zero Exchange on either side
        val joined = cat.join("facts", "dims", Seq("k"))
        val plan = executed(joined)
        assert(exchanges(plan) == 0, s"expected no shuffle:\n$plan")
        assert(joined.count() == 5000)

        // aggregation on the bucket key: partial+final agg fuse, no shuffle
        val agg = executed(cat.load("facts").groupBy("k").agg(sum($"v")))
        assert(exchanges(agg) == 0, s"expected no shuffle:\n$agg")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", baseline)
    } finally {
      cat.drop("facts"); cat.drop("dims")
      spark.sql("DROP DATABASE IF EXISTS colo_test")
    }
  }

  test("values survive the bucketed round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("colocated2").toString
    val cat = new CoLocated(spark, "colo_test2")
    cat.init(dir)
    val df = (1 to 300).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    try {
      cat.save("t", df, Seq("k"), nBuckets = 4)
      assert(cat.load("t").orderBy("k").as[(Long, String)].collect().toSeq ==
        (1 to 300).map(i => (i.toLong, s"v$i")))
    } finally {
      cat.drop("t")
      spark.sql("DROP DATABASE IF EXISTS colo_test2")
    }
  }
}
