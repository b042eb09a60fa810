package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle CTE-materialization rewrite (Queries.materializeCtes) must
  * force `AS MATERIALIZED` on every real CTE (DuckDB re-inlines multiply-
  * referenced CTEs — the round-6 exponential-oracle failure) while leaving
  * every OTHER `ident AS (` construct byte-identical: named windows
  * (single and comma-chained) and string literals are the two shapes a
  * prefix-token regex could corrupt into invalid SQL. */
class MaterializeCtesSpec extends AnyFunSuite {

  private def mat(sql: String) = Queries.materializeCtes(sql)

  test("single CTE is materialized") {
    assert(mat("WITH a AS (SELECT 1) SELECT * FROM a") ===
      "WITH a AS MATERIALIZED (SELECT 1) SELECT * FROM a")
  }

  test("comma-chained CTEs are all materialized") {
    assert(mat("WITH a AS (SELECT 1), b AS (SELECT 2) SELECT * FROM a, b") ===
      "WITH a AS MATERIALIZED (SELECT 1), b AS MATERIALIZED (SELECT 2) " +
        "SELECT * FROM a, b")
  }

  test("multi-line CTE list (the shipped oracle layout) is materialized") {
    val in = "WITH a AS (\n  SELECT 1),\nb AS (SELECT 2)\nSELECT * FROM b"
    assert(mat(in) ===
      "WITH a AS MATERIALIZED (\n  SELECT 1),\nb AS MATERIALIZED " +
        "(SELECT 2)\nSELECT * FROM b")
  }

  test("single named window is untouched") {
    val in = "SELECT sum(x) OVER w FROM t WINDOW w AS (ORDER BY x)"
    assert(mat(in) === in)
  }

  test("comma-chained named windows round-trip unchanged (ADVICE r7)") {
    val in = "SELECT sum(x) OVER w1, avg(x) OVER w2 FROM t " +
      "WINDOW w1 AS (ORDER BY x), w2 AS (PARTITION BY y ORDER BY x)"
    assert(mat(in) === in)
  }

  test("CTE query with a trailing multi-window clause: CTEs yes, windows no") {
    val in = "WITH a AS (SELECT x, y FROM t) " +
      "SELECT sum(x) OVER w1, avg(x) OVER w2 FROM a " +
      "WINDOW w1 AS (ORDER BY x), w2 AS (ORDER BY y)"
    assert(mat(in) ===
      "WITH a AS MATERIALIZED (SELECT x, y FROM t) " +
        "SELECT sum(x) OVER w1, avg(x) OVER w2 FROM a " +
        "WINDOW w1 AS (ORDER BY x), w2 AS (ORDER BY y)")
  }

  test("string literal containing ', x AS (' round-trips unchanged") {
    val in = "SELECT 'hello, x AS (injection), y AS (more' AS s FROM t"
    assert(mat(in) === in)
    val in2 = "SELECT 'WITH a AS (SELECT 1)' AS s FROM t"
    assert(mat(in2) === in2)
  }

  test("escaped quote inside a string stays opaque") {
    val in = "SELECT 'it''s, x AS (' FROM t"
    assert(mat(in) === in)
  }

  test("nested WITH inside a CTE body is materialized too") {
    val in = "WITH a AS (WITH inner_x AS (SELECT 1) SELECT * FROM inner_x) " +
      "SELECT * FROM a"
    assert(mat(in) ===
      "WITH a AS MATERIALIZED (WITH inner_x AS MATERIALIZED (SELECT 1) " +
        "SELECT * FROM inner_x) SELECT * FROM a")
  }

  test("CTE column list form name(a, b) AS (...) is materialized") {
    assert(mat("WITH a(x, y) AS (SELECT 1, 2) SELECT * FROM a") ===
      "WITH a(x, y) AS MATERIALIZED (SELECT 1, 2) SELECT * FROM a")
  }

  test("WITH RECURSIVE keeps the keyword and materializes the CTE") {
    assert(mat("WITH RECURSIVE a AS (SELECT 1) SELECT * FROM a") ===
      "WITH RECURSIVE a AS MATERIALIZED (SELECT 1) SELECT * FROM a")
  }

  test("already-annotated AS MATERIALIZED / AS NOT MATERIALIZED kept as written") {
    val in = "WITH a AS MATERIALIZED (SELECT 1), b AS NOT MATERIALIZED " +
      "(SELECT 2), c AS (SELECT 3) SELECT * FROM a, b, c"
    assert(mat(in) ===
      "WITH a AS MATERIALIZED (SELECT 1), b AS NOT MATERIALIZED " +
        "(SELECT 2), c AS MATERIALIZED (SELECT 3) SELECT * FROM a, b, c")
  }

  test("CAST(x AS type) inside a CTE body is not a CTE boundary") {
    val in = "WITH a AS (SELECT CAST(x AS VARCHAR) AS s FROM t) SELECT * FROM a"
    assert(mat(in) ===
      "WITH a AS MATERIALIZED (SELECT CAST(x AS VARCHAR) AS s FROM t) " +
        "SELECT * FROM a")
  }

  test("rewrite is insert-only on every shipped oracle") {
    // Removing the inserted token must reproduce the raw SQL exactly —
    // proves the scanner never reorders, drops, or duplicates input.
    Queries.rawOracles.foreach { case (name, raw) =>
      val out = Queries.materializeCtes(raw)
      assert(out.replace("MATERIALIZED (", "(") ===
        raw.replace("MATERIALIZED (", "("), s"oracle $name not insert-only")
    }
  }

  test("every shipped WITH-oracle gets at least one materialized CTE") {
    Queries.rawOracles.foreach { case (name, raw) =>
      if (raw.toUpperCase.startsWith("WITH"))
        assert(Queries.materializeCtes(raw).contains("AS MATERIALIZED ("),
          s"oracle $name has a WITH but no materialized CTE")
    }
  }
}
