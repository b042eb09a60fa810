package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden vectors from the reference's temporal tests
  * (tipoca-stream pkg/transformer/debezium/message_test.go:7-116;
  * FIXTURES.md §4). */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.as("v")).head().getString(0)

  test("DATE: days since epoch") {
    assert(one(Temporal.debeziumDate(lit(6807))) == "1988-08-21")
    assert(one(Temporal.debeziumDate(lit(-13023))) == "1934-05-07")
    assert(one(Temporal.debeziumDate(lit(0))) == "1970-01-01")
  }

  test("TIMESTAMP: ISO string surgery") {
    assert(one(Temporal.debeziumTimestamp(lit("1988-08-21T14:01:02Z"))) ==
      "1988-08-21 14:01:02")
  }

  test("DATETIME: epoch millis, fractional lengths") {
    assert(one(Temporal.debeziumDatetimeMillis(lit(588175262000L), 0)) ==
      "1988-08-21 14:01:02")
    assert(one(Temporal.debeziumDatetimeMillis(lit(588175262230L), 2)) ==
      "1988-08-21 14:01:02.23")
    assert(one(Temporal.debeziumDatetimeMillis(lit(1602736317708L), 3)) ==
      "2020-10-15 04:31:57.708")
  }

  test("DATETIME(6): epoch micros") {
    assert(one(Temporal.debeziumDatetimeMicros(lit(588175262123456L), 6)) ==
      "1988-08-21 14:01:02.123456")
  }

  test("DATETIME dispatch by declared source length") {
    assert(one(Temporal.debeziumDatetime(lit(588175262000L), "")) ==
      "1988-08-21 14:01:02")
    assert(one(Temporal.debeziumDatetime(lit(588175262123456L), "6")) ==
      "1988-08-21 14:01:02.123456")
  }

  test("TIME: epoch micros to HH:mm:ss") {
    assert(one(Temporal.debeziumTime(lit(39600000000L))) == "11:00:00")
    assert(one(Temporal.debeziumTime(lit(40810000000L))) == "11:20:10")
  }

  test("convert dispatch covers all temporal source types") {
    assert(one(Temporal.convert(lit(6807), "DATE", "")) == "1988-08-21")
    assert(one(Temporal.convert(lit("1988-08-21T14:01:02Z"), "TIMESTAMP", "")) ==
      "1988-08-21 14:01:02")
    assert(one(Temporal.convert(lit(39600000000L), "TIME", "")) == "11:00:00")
    intercept[IllegalArgumentException] {
      Temporal.convert(lit(1), "VARCHAR", "")
    }
  }

  test("fraction is zero-padded (divergence note in Temporal scaladoc)") {
    // 50ms must render ".050"-style, not the reference's strconv ".50" bug.
    assert(one(Temporal.debeziumDatetimeMillis(lit(588175262050L), 3)) ==
      "1988-08-21 14:01:02.050")
  }
}
