package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden type-mapping vectors from the reference
  * (pkg/redshift/redshift_test.go:30-355; FIXTURES.md §7). */
class TypeMapperSpec extends AnyFunSuite {

  test("text family maps to varchar(65535)") {
    assert(TypeMapper.warehouseType("string", "LONGTEXT") ==
      "character varying(65535)")
    assert(TypeMapper.warehouseType("string", "JSON") ==
      "character varying(65535)")
    assert(TypeMapper.warehouseType("string", "TEXT") ==
      "character varying(65535)")
  }

  test("unknown source type falls back to debezium type") {
    assert(TypeMapper.warehouseType("long", "SOMETHING_NEW") == "bigint")
  }

  test("varchar gets x4 utf8 expansion (FIXTURES §2)") {
    assert(TypeMapper.warehouseType("string", "VARCHAR", "255") ==
      "character varying(1020)")
    assert(TypeMapper.warehouseType("string", "VARCHAR", "1100") ==
      "character varying(4400)")
  }

  test("masked varchar clamps to [50, 65535]") {
    assert(TypeMapper.warehouseType("string", "VARCHAR", "40000", masked = true) ==
      "character varying(65535)")
    assert(TypeMapper.warehouseType("string", "VARCHAR", "5", masked = true) ==
      "character varying(50)")
    assert(TypeMapper.warehouseType("string", "VARCHAR", "5") ==
      "character varying(20)")
  }

  test("numeric defaults and bounds") {
    assert(TypeMapper.warehouseType("string", "DECIMAL") == "numeric(18,0)")
    assert(TypeMapper.warehouseType("string", "DECIMAL", "39", "40") ==
      "numeric(38,37)")
    assert(TypeMapper.warehouseType("string", "DECIMAL", "10", "4") ==
      "numeric(10,4)")
  }

  test("masked numerics and ints become varchar(50)") {
    assert(TypeMapper.warehouseType("string", "DECIMAL", "5", "2", masked = true) ==
      "character varying(50)")
    assert(TypeMapper.warehouseType("int32", "INT", masked = true) ==
      "character varying(50)")
  }

  test("temporal and misc mappings") {
    assert(TypeMapper.warehouseType("string", "TIME") == "character varying(32)")
    assert(TypeMapper.warehouseType("int32", "DATE") == "date")
    assert(TypeMapper.warehouseType("string", "DATETIME") ==
      "timestamp without time zone")
    assert(TypeMapper.warehouseType("boolean", "BIT") == "boolean")
    assert(TypeMapper.warehouseType("string", "ENUM") ==
      "character varying(256)")
  }

  test("spark-native types derived from warehouse mapping") {
    assert(TypeMapper.sparkTypeFor("int32", "INT") == IntegerType)
    assert(TypeMapper.sparkTypeFor("long", "BIGINT") == LongType)
    assert(TypeMapper.sparkTypeFor("string", "DECIMAL", "10", "4") ==
      DecimalType(10, 4))
    assert(TypeMapper.sparkTypeFor("int32", "DATE") == DateType)
    assert(TypeMapper.sparkTypeFor("string", "DATETIME") == TimestampNTZType)
    assert(TypeMapper.sparkTypeFor("string", "VARCHAR", "255") == StringType)
    assert(TypeMapper.sparkTypeFor("boolean", "BOOL") == BooleanType)
    assert(TypeMapper.sparkTypeFor("float64", "DOUBLE") == DoubleType)
  }

  test("unmapped type with no debezium fallback throws") {
    intercept[IllegalArgumentException] {
      TypeMapper.warehouseType("mystery", "ALIEN")
    }
  }
}
