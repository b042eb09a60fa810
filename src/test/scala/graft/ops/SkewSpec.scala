package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 90 rows of key "hot", 10 distinct others
  private def big = ((1 to 90).map(i => ("hot", i.toLong)) ++
    (1 to 10).map(i => (s"k$i", i.toLong))).toDF("k", "rowid")
  private def small = (Seq("hot") ++ (1 to 10).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, s"v$i") }.toDF("k", "v")

  test("saltedJoin equals plain join") {
    val plain = big.join(small, Seq("k")).select("k", "rowid", "v")
      .as[(String, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), col("rowid"), 8)
      .select("k", "rowid", "v")
      .as[(String, Long, String)].collect().toSet
    assert(salted == plain)
    assert(salted.count(_._1 == "hot") == 90)
  }

  test("saltedCount equals plain groupBy count") {
    val plain = big.groupBy("k").count().as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(big, Seq("k"), col("rowid"), 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salt actually splits the hot key") {
    val salts = Skew.addSalt(big.filter(col("k") === "hot"), col("rowid"), 8)
      .select("__salt").distinct().count()
    assert(salts > 1)
  }
}
