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
}
