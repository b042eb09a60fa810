package graft.cdc

import graft.core.{Cdc, TableSpec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The CDC row-transform stage (SURVEY §2.2 P1-P10): Debezium envelope
  * (`before`/`after` structs + Kafka `offset`) → flat, string-typed,
  * warehouse-ready rows with `kafkaoffset` + `debeziumop` metadata columns.
  *
  * Reference behavior: tipoca-stream pkg/transformer/debezium/message.go
  * (extract 30-86, getOperation 88-114, Transform 269-337). Implemented as a
  * single declarative projection so Catalyst keeps the whole stage in one
  * WholeStageCodegen span — no per-row interpretation, no UDFs.
  */
object DebeziumTransform {

  /** Envelope StructType for a payload schema (FIXTURES.md §1). */
  def envelopeSchema(payload: StructType): StructType = StructType(Seq(
    StructField("before", payload, nullable = true),
    StructField("after", payload, nullable = true),
    StructField("op", StringType, nullable = true),
    StructField("ts_ms", LongType, nullable = true)
  ))

  /** P2 — operation classification (message.go:88-114): before empty &
    * after present → CREATE; both → UPDATE; after empty → DELETE. */
  def operation(before: Column, after: Column): Column =
    when(after.isNotNull && before.isNull, lit(Cdc.OpCreate))
      .when(after.isNotNull && before.isNotNull, lit(Cdc.OpUpdate))
      .when(after.isNull && before.isNotNull, lit(Cdc.OpDelete))

  /** P10 — null normalization: nil or whitespace-only → SQL NULL
    * (batch_processor.go:300-314; redshift.go EMPTYASNULL). */
  def normalizeNull(c: Column): Column =
    when(trim(c) === "", lit(null).cast(StringType)).otherwise(c)

  /** Full transform for one table.
    *
    * @param df    rows with `before`/`after` structs and an `offset` column
    *              (Kafka source metadata).
    * @param spec  table spec carrying per-column source types for temporal
    *              conversion (P4-P7) and polygon blanking (P8).
    */
  def apply(df: DataFrame, spec: TableSpec): DataFrame = {
    val op = operation(col("before"), col("after"))
    // P3 — row selection by op: DELETE takes before, else after.
    val payload = when(op === Cdc.OpDelete, col("before")).otherwise(col("after"))

    val cols = spec.columns.map { c =>
      val raw = payload.getField(c.name)
      val srcType = c.sourceType.columnType.toLowerCase
      val converted =
        // P8 — geometry blanking (message.go:297-302).
        if (c.debeziumType == "record" && srcType == "polygon") lit("")
        // P4-P7 — temporal conversions only for warehouse date/timestamp
        // columns (message.go:303-325 gates on RedshiftDate/RedshiftTimeStamp).
        else if (srcType == "date" || srcType == "datetime" ||
                 srcType == "timestamp")
          Temporal.convert(raw.cast(StringType), c.sourceType.columnType,
            c.sourceType.columnLength)
        else raw.cast(StringType)
      // P1 — stringify + lowercase names; P10 — empty → NULL.
      normalizeNull(converted).as(c.lowerName)
    }

    // P9 — metadata annotation (message.go:327-331).
    df.select(
      (col("offset").cast(StringType).as(Cdc.OffsetColumn) +:
        op.as(Cdc.OperationColumn) +:
        cols): _*)
  }

  /** P11 — tombstone filter: zero-length Kafka values carry no envelope
    * (batcher_handler.go:230-237). Applied on the raw Kafka frame. */
  def dropTombstones(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.filter(col(valueCol).isNotNull && length(col(valueCol)) > 0)
}
