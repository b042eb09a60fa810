package graft.warehouse

import graft.core.{ColSpec, TableSpec}
import graft.schema.TypeMapper

/** D4 — schema diff (tipoca-stream pkg/redshift/redshift.go:988-1190
  * `CheckSchemas`): compare the incoming table spec against the target and
  * classify changes into the reference's three migration classes:
  *
  *  - [[Transact]]: ADD/DROP COLUMN — safely applied in one transaction;
  *  - [[VarcharResize]]: widen/narrow `character varying` lengths — applied
  *    as non-transactional ALTER COLUMN TYPE;
  *  - [[TableMigrate]]: any other type change — requires a table-replace
  *    migration (D5). Column renames are unsupported, matching the
  *    reference (a rename looks like drop+add).
  */
object SchemaDiff {

  sealed trait Change { def col: ColSpec }
  final case class AddColumn(col: ColSpec) extends Change
  final case class DropColumn(col: ColSpec) extends Change
  final case class VarcharResize(col: ColSpec, from: String, to: String) extends Change
  final case class TypeMigrate(col: ColSpec, from: String, to: String) extends Change

  final case class Diff(
      adds: Seq[AddColumn],
      drops: Seq[DropColumn],
      resizes: Seq[VarcharResize],
      migrates: Seq[TypeMigrate]) {
    def isEmpty: Boolean =
      adds.isEmpty && drops.isEmpty && resizes.isEmpty && migrates.isEmpty
    /** True when the only way forward is a table-replace migration (D5). */
    def needsTableMigration: Boolean = migrates.nonEmpty
  }

  private def isVarchar(t: String): Boolean =
    t.startsWith("character varying")

  /** Diff `input` (desired, from the CDC schema) against `target`
    * (current warehouse state). Matching is by lowercase name, as in the
    * reference (position changes are ignored — Spark/parquet is
    * name-addressed). */
  def diff(input: TableSpec, target: TableSpec): Diff = {
    val inCols = input.columns.map(c => c.lowerName -> c).toMap
    val tgtCols = target.columns.map(c => c.lowerName -> c).toMap

    val adds = input.columns.filterNot(c => tgtCols.contains(c.lowerName))
      .map(AddColumn)
    val drops = target.columns.filterNot(c => inCols.contains(c.lowerName))
      .map(DropColumn)

    val changed = for {
      c <- input.columns
      t <- tgtCols.get(c.lowerName)
      inType = TypeMapper.warehouseType(c)
      tgtType = TypeMapper.warehouseType(t)
      if inType != tgtType
    } yield
      if (isVarchar(inType) && isVarchar(tgtType))
        Left(VarcharResize(c, tgtType, inType))
      else Right(TypeMigrate(c, tgtType, inType))

    Diff(adds, drops,
      changed.collect { case Left(r) => r },
      changed.collect { case Right(m) => m })
  }

  /** Emit the ALTER statements for the transact-able + resize classes. */
  def alterStatements(schema: String, table: String, d: Diff): Seq[String] =
    d.adds.map(a => Ddl.addColumn(schema, table, a.col)) ++
      d.drops.map(dr => Ddl.dropColumn(schema, table, dr.col.name)) ++
      d.resizes.map(r => Ddl.alterVarcharLength(schema, table, r.col))
}
