package graft.warehouse

import java.sql.{Connection, DriverManager}
import graft.core.{Cdc, ColSpec, SourceType, TableSpec}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Executes the emitted DDL against embedded Derby (in-memory JDBC) —
  * proof that the D3→D7 statements parse and run on a real SQL engine,
  * mirroring the reference's transactional load
  * (load_processor.go:395-444): create → migrate (add/drop/widen) →
  * staged merge in one transaction → release swap.
  */
class JdbcDdlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var conn: Connection = _

  private val spec = TableSpec("graft", "users", Seq(
    ColSpec("id", "int64", SourceType("BIGINT"), notNull = true, primaryKey = true),
    ColSpec("name", "string", SourceType("VARCHAR", "32"), defaultVal = "o'hara"),
    ColSpec("balance", "string", SourceType("DECIMAL", "18", "2"))))

  override def beforeAll(): Unit = {
    conn = DriverManager.getConnection("jdbc:derby:memory:graftddl;create=true")
    JdbcRunner.execute(conn, "CREATE SCHEMA \"graft\"")
  }

  override def afterAll(): Unit = {
    conn.close()
    try DriverManager.getConnection("jdbc:derby:memory:graftddl;drop=true")
    catch { case _: java.sql.SQLException => () } // drop always "fails" with 08006
  }

  private def queryLongs(sql: String): Seq[Long] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      val out = Iterator.continually(rs).takeWhile(_.next()).map(_.getLong(1)).toVector
      out
    } finally st.close()
  }

  test("D3 createTable (ANSI dialect) executes, defaults escaped") {
    val ddl = Ddl.createTable(spec, dialect = Ddl.Ansi)
    // the single quote in the DEFAULT value must arrive doubled
    assert(ddl.contains("DEFAULT 'o''hara'"))
    JdbcRunner.execute(conn, ddl)
    JdbcRunner.execute(conn,
      "INSERT INTO \"graft\".\"users\" (\"id\", \"balance\") VALUES (1, 10.00)")
    // DEFAULT applied by the engine → proves the clause parsed correctly
    val st = conn.createStatement()
    val rs = st.executeQuery("SELECT \"name\" FROM \"graft\".\"users\"")
    rs.next()
    assert(rs.getString(1) == "o'hara")
    st.close()
  }

  test("D4 SchemaDiff changes execute: add, widen, drop") {
    val evolved = TableSpec("graft", "users", Seq(
      spec.columns.head,
      spec.columns(1).copy(sourceType = SourceType("VARCHAR", "64")), // widen
      ColSpec("email", "string", SourceType("VARCHAR", "40"))))       // add
    val d = SchemaDiff.diff(evolved, spec)
    d.adds.foreach(a => JdbcRunner.execute(conn,
      Ddl.addColumn("graft", "users", a.col)))
    d.resizes.foreach(r => JdbcRunner.execute(conn,
      Ddl.alterVarcharLength("graft", "users", r.col, Ddl.Ansi)))
    // drop path: remove the column we just added
    JdbcRunner.execute(conn, Ddl.dropColumn("graft", "users", "email"))
    assert(queryLongs("SELECT count(*) FROM \"graft\".\"users\"") == Seq(1L))
  }

  test("D6+R1-R4 staged merge runs in one transaction and rolls back on failure") {
    val staged = Ddl.stagingSpec(spec)
    assert(staged.name == "users_staged")
    JdbcRunner.execute(conn, Ddl.createTable(staged, dialect = Ddl.Ansi))
    JdbcRunner.execute(conn,
      "INSERT INTO \"graft\".\"users_staged\" VALUES ('7', 'UPDATE', 1, 'ann', 99.00)")
    JdbcRunner.execute(conn,
      "INSERT INTO \"graft\".\"users_staged\" VALUES ('8', 'CREATE', 2, 'bob', 5.00)")

    // the reference's merge: delete-common + insert, one transaction
    JdbcRunner.inTransaction(conn, Seq(
      "DELETE FROM \"graft\".\"users\" WHERE \"id\" IN " +
        "(SELECT \"id\" FROM \"graft\".\"users_staged\")",
      "INSERT INTO \"graft\".\"users\" (\"id\", \"name\", \"balance\") " +
        s"""SELECT "id", "name", "balance" FROM "graft"."users_staged" """ +
        s"""WHERE "${Cdc.OperationColumn}" <> 'DELETE'"""))
    assert(queryLongs("SELECT \"id\" FROM \"graft\".\"users\" ORDER BY \"id\"")
      == Seq(1L, 2L))

    // a failing batch rolls back wholesale
    intercept[java.sql.SQLException] {
      JdbcRunner.inTransaction(conn, Seq(
        "DELETE FROM \"graft\".\"users\"",
        "INSERT INTO \"graft\".\"no_such_table\" VALUES (1)"))
    }
    assert(queryLongs("SELECT count(*) FROM \"graft\".\"users\"") == Seq(2L))
  }

  test("D5 table-replace migration: new-typed clone + copy + swap") {
    // TypeMigrate (SchemaDiff's non-transactable class): widen balance
    // from numeric to varchar via a staged rebuild, reference strategy =
    // create-new → INSERT..SELECT cast → swap (redshift.go ReplaceTable)
    val migrated = TableSpec("graft", "users_migrating", Seq(
      spec.columns.head,
      spec.columns(1),
      ColSpec("balance", "string", SourceType("VARCHAR", "24"))))
    val d = SchemaDiff.diff(migrated.copy(name = "users"), spec)
    assert(d.needsTableMigration) // numeric -> varchar can't ALTER in place
    JdbcRunner.inTransaction(conn, Seq(
      Ddl.createTable(migrated, dialect = Ddl.Ansi),
      "INSERT INTO \"graft\".\"users_migrating\" (\"id\", \"name\", \"balance\") " +
        "SELECT \"id\", \"name\", TRIM(CAST(\"balance\" AS CHAR(24))) " +
        "FROM \"graft\".\"users\""))
    Ddl.releaseSwap("graft", "users", "_migrating", None, Ddl.Ansi)
      .foreach(JdbcRunner.execute(conn, _))
    val st = conn.createStatement()
    val rs = st.executeQuery(
      "SELECT \"balance\" FROM \"graft\".\"users\" WHERE \"id\" = 1")
    rs.next()
    assert(rs.getString(1).nonEmpty) // stringified numeric survived the copy
    st.close()
  }

  test("D7 releaseSwap executes: drop + rename") {
    JdbcRunner.execute(conn,
      "CREATE TABLE \"graft\".\"users_reload_v2\" (\"id\" bigint)")
    JdbcRunner.execute(conn,
      "INSERT INTO \"graft\".\"users_reload_v2\" VALUES (42)")
    val stmts = Ddl.releaseSwap("graft", "users", "_reload_v2",
      grantGroup = None, dialect = Ddl.Ansi)
    stmts.foreach(JdbcRunner.execute(conn, _))
    assert(queryLongs("SELECT \"id\" FROM \"graft\".\"users\"") == Seq(42L))
  }
}
