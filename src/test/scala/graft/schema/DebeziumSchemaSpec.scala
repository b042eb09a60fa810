package graft.schema

import graft.mask.MaskConfig
import org.scalatest.funsuite.AnyFunSuite

/** D1 schema transform against a ts.inventory.customers-shaped envelope
  * (FIXTURES.md §2/§3; reference schema_test.go:68-158). */
class DebeziumSchemaSpec extends AnyFunSuite {

  private def field(name: String, avroType: String, srcType: String,
      len: String = "", scale: String = "", nullable: Boolean = true): String = {
    val params =
      s""""connect.parameters": {
         |  "__debezium.source.column.type": "$srcType"
         |  ${if (len.nonEmpty) s""","__debezium.source.column.length": "$len"""" else ""}
         |  ${if (scale.nonEmpty) s""","__debezium.source.column.scale": "$scale"""" else ""}
         |}""".stripMargin
    val typed = s"""{"type": "$avroType", $params}"""
    if (nullable)
      s"""{"name": "$name", "type": ["null", $typed], "default": null}"""
    else
      s"""{"name": "$name", "type": $typed}"""
  }

  private val valueSchema =
    s"""{
       |"type": "record", "name": "Envelope",
       |"namespace": "ts.inventory.customers",
       |"fields": [
       |  {"name": "before", "type": ["null", {
       |     "type": "record", "name": "Value", "fields": [
       |       ${field("ID", "int", "INT", "11", nullable = false)},
       |       ${field("first_name", "string", "VARCHAR", "1100")},
       |       ${field("email", "string", "VARCHAR", "255", nullable = false)},
       |       ${field("dob", "int", "DATE")},
       |       ${field("score", "string", "DECIMAL", "10", "4")},
       |       ${field("relation", "string", "ENUM")}
       |     ]}], "default": null},
       |  {"name": "after", "type": ["null", "Value"], "default": null},
       |  {"name": "op", "type": "string"},
       |  {"name": "ts_ms", "type": ["null", "long"], "default": null}
       |]}""".stripMargin

  private val keySchema =
    """{"type": "record", "name": "Key", "fields": [
      |  {"name": "ID", "type": "int"}]}""".stripMargin

  private val spec = DebeziumSchema.parseEnvelope(valueSchema, Some(keySchema))

  test("table identity from namespace") {
    assert(spec.schema == "inventory" && spec.name == "customers")
  }

  test("columns parsed with source params; PK from key schema") {
    assert(spec.columns.map(_.name) ==
      Seq("ID", "first_name", "email", "dob", "score", "relation"))
    val id = spec.column("id").get
    assert(id.primaryKey && id.notNull && id.debeziumType == "int32")
    assert(id.sourceType == graft.core.SourceType("INT", "11"))
    val score = spec.column("score").get
    assert(score.sourceType.columnLength == "10" &&
      score.sourceType.columnScale == "4")
  }

  test("warehouse types follow the sizing rules (FIXTURES §2)") {
    assert(TypeMapper.warehouseType(spec.column("first_name").get) ==
      "character varying(4400)")
    assert(TypeMapper.warehouseType(spec.column("email").get) ==
      "character varying(1020)")
    assert(TypeMapper.warehouseType(spec.column("dob").get) == "date")
    assert(TypeMapper.warehouseType(spec.column("score").get) == "numeric(10,4)")
  }

  test("ENUM widens to string max (FIXTURES §3)") {
    assert(TypeMapper.warehouseType(spec.column("relation").get) ==
      "character varying(65535)")
  }

  test("mask overrides: flags, M11 widening, extra cols sorted first") {
    val cfg = MaskConfig(
      nonPiiKeys = Map("customers" -> Seq("id")),
      conditionalNonPiiKeys =
        Map("customers" -> Map("email" -> Seq("%example.com"))),
      lengthKeys = Map("customers" -> Seq("email")),
      mobileKeys = Map("customers" -> Seq("first_name")),
      distKeys = Map("customers" -> Seq("id")),
      sortKeys = Map("customers" -> Seq("dob")))
    val masked = DebeziumSchema.withMaskOverrides(spec, cfg)

    // extra key columns first, sorted by name
    assert(masked.columns.take(2).map(_.name) ==
      Seq("email_length", "first_name_init5"))
    val byName = masked.columns.map(c => c.lowerName -> c).toMap
    assert(!byName("id").masked && byName("id").distKey)
    assert(byName("first_name").masked)
    assert(byName("dob").masked && byName("dob").sortOrdinal == 1)
    // M11: conditional column widened to string max
    assert(byName("email").masked)
    assert(TypeMapper.warehouseType(byName("email")) ==
      "character varying(65535)")
  }

  test("masked column type override is varchar(50) (M12)") {
    val masked = DebeziumSchema.withMaskOverrides(spec, MaskConfig())
    val id = masked.column("id").get
    assert(id.masked)
    assert(TypeMapper.warehouseType(id) == "character varying(50)")
  }
}
