package graft.core

/** Core table/column model for the CDC engine.
  *
  * Mirrors the information content of the reference's table model
  * (tipoca-stream pkg/redshift/redshift.go:124-163 `Table`/`ColInfo`) but is a
  * plain Scala ADT; the Spark `StructType` for a table is derived from it, and
  * warehouse DDL is emitted from it (see [[graft.warehouse.Ddl]]).
  */
final case class SourceType(
    columnType: String = "",
    columnLength: String = "",
    columnScale: String = "")

final case class ColSpec(
    name: String,
    debeziumType: String = "string",
    sourceType: SourceType = SourceType(),
    defaultVal: String = "",
    notNull: Boolean = false,
    primaryKey: Boolean = false,
    sortOrdinal: Int = 0,
    distKey: Boolean = false,
    masked: Boolean = false) {
  def lowerName: String = name.toLowerCase
}

final case class TableSpec(
    schema: String,
    name: String,
    columns: Seq[ColSpec]) {
  def primaryKeys: Seq[String] = columns.filter(_.primaryKey).map(_.lowerName)
  def column(name: String): Option[ColSpec] =
    columns.find(_.lowerName == name.toLowerCase)
}

object Cdc {
  /** Metadata columns every transformed CDC row carries
    * (reference pkg/transformer/transformer.go:9-17). */
  val OffsetColumn = "kafkaoffset"
  val OperationColumn = "debeziumop"

  val OpCreate = "CREATE"
  val OpUpdate = "UPDATE"
  val OpDelete = "DELETE"
}
