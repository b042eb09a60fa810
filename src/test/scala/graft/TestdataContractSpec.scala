package graft

import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.types._

/** Fixture contract for the driver's testdata (TESTDATA.md).
  *
  * Round 8 burned a full correctness cycle because the driver silently
  * regenerated `events.parquet` with `ts` as TIMESTAMP(µs) while the engine
  * still assumed raw INT64 nanos — six subtle hash mismatches instead of one
  * obvious failure. This spec IS that obvious failure: it pins the physical
  * contract of every fixture table the engine reads, so a future testdata
  * regeneration that changes units, column names, or types fails HERE with a
  * message naming TESTDATA.md, not downstream in six oracle diffs.
  */
class TestdataContractSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def hint(t: String) =
    s"testdata contract changed for $t (see TESTDATA.md + graft.Tables): "

  test("events.ts parquet logical type is a unit Tables normalizes") {
    val unit = Tables.tsUnit(spark, dir)
    assert(Set(TimeUnit.NANOS, TimeUnit.MICROS, TimeUnit.MILLIS)(unit),
      hint("events") + s"unsupported ts epoch unit $unit")
  }

  test("events normalized read yields epoch-microsecond longs in range") {
    val df = Tables.read(spark, dir, "events")
    assert(df.schema("ts").dataType == LongType, hint("events") +
      "ts must normalize to LongType epoch micros")
    val Array(lo, hi) = df.selectExpr("min(ts)", "max(ts)").collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    // epoch micros for any plausible generator date (1990..2100); a nanos
    // misread overshoots 1000x, a millis misread undershoots 1000x
    val min = 631152000000000L  // 1990-01-01 in µs
    val max = 4102444800000000L // 2100-01-01 in µs
    assert(lo >= min && hi <= max, hint("events") +
      s"ts range [$lo,$hi] outside plausible epoch-µs window — unit drift?")
  }

  test("pinned column contracts of fixture tables the engine reads") {
    // name -> (column, expected spark type) samples chosen to catch silent
    // type drift in the columns queries actually compute on
    val pins = Seq(
      ("events", "event_id", LongType), ("events", "user_id", LongType),
      ("events", "event_type", StringType), ("events", "value", DoubleType),
      ("lineitem", "l_orderkey", LongType),
      ("lineitem", "l_quantity", DoubleType),
      ("lineitem", "l_returnflag", StringType),
      ("orders", "o_orderkey", LongType),
      ("orders", "o_totalprice", DoubleType),
      ("orders", "o_orderdate", TimestampNTZType),
      ("customer", "c_custkey", LongType),
      ("customer", "c_acctbal", DoubleType),
      ("documents", "doc_id", LongType), ("documents", "text", StringType),
      ("documents", "lang", StringType),
      ("documents", "n_chars", LongType),
      ("embeddings", "vec_id", LongType))
    for ((t, c, tpe) <- pins) {
      val schema = Tables.read(spark, dir, t).schema
      assert(schema.fieldNames.contains(c), hint(t) + s"missing column $c")
      assert(schema(c).dataType == tpe,
        hint(t) + s"$c is ${schema(c).dataType}, engine pins $tpe")
    }
    val emb = Tables.read(spark, dir, "embeddings").schema("embedding")
    assert(emb.dataType.isInstanceOf[ArrayType], hint("embeddings") +
      s"embedding is ${emb.dataType}, engine pins array<float-ish>")
  }
}
