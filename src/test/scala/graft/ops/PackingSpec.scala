package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, 10L + (i % 7) * 13L)).toDF("id", "n")

  test("every doc lands in exactly one pack; packs are budget-quantized") {
    val packed = Packing.nextFit(docs(200), "id", "n", budget = 100L, shards = 4)
    assert(packed.count() == 200)
    // a pack's payload starts strictly inside its budget window: the
    // pre-doc prefix total lies in [pack_id*budget, (pack_id+1)*budget)
    val bad = packed
      .withColumn("w", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shard")
          .orderBy(graft.functions.Portable.h60(col("id").cast("string")), col("id"))
          .rowsBetween(Long.MinValue, -1)))
      .filter(coalesce(col("w"), lit(0L)) < col("pack_id") * 100 ||
        coalesce(col("w"), lit(0L)) >= (col("pack_id") + 1) * 100)
    assert(bad.count() == 0)
  }

  test("pack_pos is dense 1..k within each (shard, pack)") {
    val packed = Packing.nextFit(docs(100), "id", "n", budget = 64L, shards = 2)
    val check = packed.groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("c"), max(col("pack_pos")).as("mx"),
        min(col("pack_pos")).as("mn"))
      .filter(col("c") =!= col("mx") || col("mn") =!= 1)
    assert(check.count() == 0)
  }

  test("oversize flags docs beyond the budget, never splits them") {
    val d = Seq((1L, 10L), (2L, 500L), (3L, 20L)).toDF("id", "n")
    val packed = Packing.nextFit(d, "id", "n", budget = 100L, shards = 1)
    val over = packed.filter(col("oversize")).select("id").as[Long].collect()
    assert(over.toSeq == Seq(2L))
    // the oversize doc has one row (not split across packs)
    assert(packed.filter(col("id") === 2L).count() == 1)
  }

  test("deterministic across partitionings") {
    val a = Packing.nextFit(docs(150), "id", "n", 80L, 4).collect().toSet
    val b = Packing.nextFit(docs(150).repartition(13), "id", "n", 80L, 4)
      .collect().toSet
    assert(a == b)
  }
}
