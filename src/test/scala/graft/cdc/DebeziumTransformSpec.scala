package graft.cdc

import graft.SparkSpec
import graft.core.{Cdc, ColSpec, SourceType, TableSpec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Envelope transform (SURVEY §2.2 P1-P11) against the canonical
  * inventory.customers fixture (FIXTURES.md §1). */
class DebeziumTransformSpec extends SparkSpec {

  private val payload = StructType(Seq(
    StructField("ID", IntegerType),
    StructField("first_name", StringType),
    StructField("dob", IntegerType),
    StructField("area", StringType)))

  private val schema = StructType(Seq(
    StructField("offset", LongType),
    StructField("before", payload),
    StructField("after", payload)))

  private val spec = TableSpec("inventory", "customers", Seq(
    ColSpec("ID", "int32", SourceType("INT", "11")),
    ColSpec("first_name", "string", SourceType("VARCHAR", "255")),
    ColSpec("dob", "int32", SourceType("DATE")),
    ColSpec("area", "record", SourceType("POLYGON"))))

  private def mkRow(offset: Long, before: Row, after: Row): Row =
    Row(offset, before, after)

  private val create = mkRow(1L, null, Row(7, "Ada", 6807, "poly"))
  private val update = mkRow(2L, Row(7, "Ada", 6807, "p"), Row(7, "Ada2", 6807, "p"))
  private val delete = mkRow(3L, Row(7, "Ada2", 6807, "p"), null)
  private val blank = mkRow(4L, null, Row(8, "   ", 0, null))

  private def transform(rs: Row*) = DebeziumTransform(
    spark.createDataFrame(
      spark.sparkContext.parallelize(rs), schema), spec)

  test("P2/P3 op classification and row selection") {
    val out = transform(create, update, delete)
      .orderBy(Cdc.OffsetColumn).collect()
    assert(out.map(_.getAs[String](Cdc.OperationColumn)).toSeq ==
      Seq(Cdc.OpCreate, Cdc.OpUpdate, Cdc.OpDelete))
    // CREATE/UPDATE read after, DELETE reads before
    assert(out(0).getAs[String]("first_name") == "Ada")
    assert(out(1).getAs[String]("first_name") == "Ada2")
    assert(out(2).getAs[String]("first_name") == "Ada2")
  }

  test("P1 names lowercased, values stringified") {
    val r = transform(create).head()
    assert(r.schema.fieldNames.contains("id"))
    assert(r.getAs[String]("id") == "7")
  }

  test("P4 temporal conversion applied to DATE columns") {
    assert(transform(create).head().getAs[String]("dob") == "1988-08-21")
  }

  test("P8 polygon blanked, P10 then nullifies it") {
    assert(transform(create).head().isNullAt(
      transform(create).head().fieldIndex("area")))
  }

  test("P10 whitespace-only values become NULL") {
    val r = transform(blank).head()
    assert(r.isNullAt(r.fieldIndex("first_name")))
  }

  test("P9 kafkaoffset metadata column is stringified offset") {
    val r = transform(create).head()
    assert(r.getAs[String](Cdc.OffsetColumn) == "1")
  }

  test("P11 tombstone filter drops empty Kafka values") {
    import spark.implicits._
    val raw = Seq(
      (1L, Array[Byte](1, 2)),
      (2L, Array.empty[Byte]),
      (3L, null: Array[Byte])).toDF("offset", "value")
    assert(DebeziumTransform.dropTombstones(raw).count() == 1)
  }

  test("envelopeSchema wraps payload as nullable before/after") {
    val env = DebeziumTransform.envelopeSchema(payload)
    assert(env.fieldNames.toSeq ==
      Seq("before", "after", "op", "ts_ms"))
    assert(env("before").nullable && env("after").nullable)
  }
}
