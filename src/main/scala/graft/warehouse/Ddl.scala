package graft.warehouse

import graft.core.{Cdc, ColSpec, TableSpec}
import graft.schema.TypeMapper

/** Warehouse DDL emission (SURVEY §2.6 D3/D6/D7) for a JDBC warehouse
  * target. Semantics from tipoca-stream pkg/redshift/redshift.go:283-422
  * (CreateTable), pkg/redshiftloader/load_processor.go:449-542 (staging
  * clone) and pkg/redshift/redshift.go:596-647 + controllers/release.go:
  * 69-146 (release swap).
  *
  * Spark-native storage (ParquetCatalog) doesn't need any of this — DDL is
  * only emitted when the sink is an external SQL warehouse.
  */
object Ddl {

  // doubled quotes: an identifier with an embedded `"` (legal in Postgres
  // sources) must not break out of the quoting — same reason DEFAULT
  // values escape single quotes below
  private def q(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  /** Dialect hooks for the statements whose syntax differs across JDBC
    * warehouses. [[Redshift]] matches the reference's target
    * (redshift.go); [[Ansi]] emits plain ANSI/Derby-compatible SQL — the
    * embedded-JDBC spec executes the whole D3→D7 lifecycle through it to
    * prove the emitted DDL parses and runs (VERDICT: live execution). */
  sealed trait Dialect {
    /** Table-level physical attributes appended to CREATE TABLE. */
    def tableAttributes(distClause: String, sortClause: String): String
    def dropTable(schema: String, table: String): String
    def renameTable(schema: String, from: String, to: String): String
    def alterColumnType(schema: String, table: String, col: String,
        typ: String): String
  }

  case object Redshift extends Dialect {
    def tableAttributes(dist: String, sort: String): String = dist + sort
    def dropTable(schema: String, table: String): String =
      s"DROP TABLE IF EXISTS ${q(schema)}.${q(table)} CASCADE"
    def renameTable(schema: String, from: String, to: String): String =
      s"ALTER TABLE ${q(schema)}.${q(from)} RENAME TO ${q(to)}"
    def alterColumnType(schema: String, table: String, col: String,
        typ: String): String =
      s"ALTER TABLE ${q(schema)}.${q(table)} ALTER COLUMN ${q(col)} TYPE $typ"
  }

  case object Ansi extends Dialect {
    def tableAttributes(dist: String, sort: String): String = ""
    def dropTable(schema: String, table: String): String =
      s"DROP TABLE ${q(schema)}.${q(table)}"
    // Derby/ANSI rename (RENAME TABLE takes an unqualified new name)
    def renameTable(schema: String, from: String, to: String): String =
      s"RENAME TABLE ${q(schema)}.${q(from)} TO ${q(to)}"
    def alterColumnType(schema: String, table: String, col: String,
        typ: String): String =
      s"ALTER TABLE ${q(schema)}.${q(table)} ALTER COLUMN ${q(col)} SET DATA TYPE $typ"
  }

  def columnDef(c: ColSpec): String = {
    val typ = TypeMapper.warehouseType(c)
    val parts = Seq(q(c.lowerName), typ) ++
      (if (c.defaultVal.nonEmpty && typ.startsWith("character varying"))
        // single quotes doubled: Debezium defaults can carry quotes, and an
        // unescaped one breaks (or injects into) the emitted statement
        Seq(s"DEFAULT '${c.defaultVal.replace("'", "''")}'") else Nil) ++
      (if (c.notNull) Seq("NOT NULL") else Nil)
    parts.mkString(" ")
  }

  /** D3 — CREATE TABLE with composite PK, compound sortkey, distkey
    * (redshift.go:283-422). */
  def createTable(t: TableSpec, ifNotExists: Boolean = false,
      dialect: Dialect = Redshift): String = {
    val cols = t.columns.map(columnDef)
    val pks = t.primaryKeys
    val pkClause =
      if (pks.isEmpty) Nil else Seq(s"PRIMARY KEY (${pks.map(q).mkString(", ")})")
    val sortCols = t.columns.filter(_.sortOrdinal > 0).sortBy(_.sortOrdinal)
    val sortClause =
      if (sortCols.isEmpty) ""
      else s" COMPOUND SORTKEY (${sortCols.map(c => q(c.lowerName)).mkString(", ")})"
    val distCols = t.columns.filter(_.distKey)
    val distClause = distCols match {
      case Seq(c) => s" DISTKEY (${q(c.lowerName)})"
      case _ => " DISTSTYLE EVEN"
    }
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    s"CREATE TABLE $ine${q(t.schema)}.${q(t.name)} (" +
      (cols ++ pkClause).mkString(", ") + ")" +
      dialect.tableAttributes(distClause, sortClause)
  }

  /** D6 — staging table spec: clone with PKs demoted, kafkaoffset PK NOT
    * NULL + debeziumop prepended, diststyle even
    * (load_processor.go:449-542; transformer.go:10-13). */
  def stagingSpec(t: TableSpec): TableSpec = {
    val demoted = t.columns.map(_.copy(
      primaryKey = false, sortOrdinal = 0, distKey = false))
    t.copy(
      name = t.name + "_staged",
      columns = Seq(
        ColSpec(Cdc.OffsetColumn, "string", notNull = true, primaryKey = true),
        ColSpec(Cdc.OperationColumn, "string")) ++ demoted)
  }

  /** D7 — release swap: drop released, rename reloaded into place, regrant
    * (redshift.go:596-647; release.go:69-146). Runs in one transaction. */
  def releaseSwap(schema: String, table: String, reloadedSuffix: String,
      grantGroup: Option[String] = None,
      dialect: Dialect = Redshift): Seq[String] = {
    val drop = dialect.dropTable(schema, table)
    val rename = dialect.renameTable(schema, table + reloadedSuffix, table)
    val grants = grantGroup.toSeq.flatMap { g =>
      Seq(s"GRANT USAGE ON SCHEMA ${q(schema)} TO GROUP $g",
        s"GRANT SELECT ON ${q(schema)}.${q(table)} TO GROUP $g")
    }
    Seq(drop, rename) ++ grants
  }

  def addColumn(schema: String, table: String, c: ColSpec): String =
    s"ALTER TABLE ${q(schema)}.${q(table)} ADD COLUMN ${columnDef(c)}"

  def dropColumn(schema: String, table: String, name: String): String =
    s"ALTER TABLE ${q(schema)}.${q(table)} DROP COLUMN ${q(name.toLowerCase)}"

  /** Non-transactional varchar widen (redshift.go:1098-1127). */
  def alterVarcharLength(schema: String, table: String, c: ColSpec,
      dialect: Dialect = Redshift): String =
    dialect.alterColumnType(schema, table, c.lowerName,
      TypeMapper.warehouseType(c))
}
