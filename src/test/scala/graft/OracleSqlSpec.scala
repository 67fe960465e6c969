package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[OracleSql.materializeCtes]] — the rewrite every oracle SQL
  * string passes through at [[SparkEntry.oracleSql]] assembly. A
  * regression here either reintroduces DuckDB's exponential CTE
  * inlining on the training chains (the 286-second q125 compare that
  * starved the driver's gate) or, worse, corrupts SQL by hinting a
  * non-CTE `AS (` site (DuckDB rejects `WINDOW w AS MATERIALIZED (`).
  */
class OracleSqlSpec extends AnyFunSuite {

  test("CTE definitions get the MATERIALIZED hint (WITH-anchored and comma-anchored)") {
    val in = "WITH a AS (SELECT 1), b AS (SELECT * FROM a) SELECT * FROM b"
    assert(OracleSql.materializeCtes(in) ==
      "WITH a AS MATERIALIZED (SELECT 1), b AS MATERIALIZED (SELECT * FROM a) SELECT * FROM b")
  }

  test("multi-line definitions and underscore/digit names rewrite") {
    val in = "WITH w_0 AS (\n  SELECT 1),\n  best_2 AS (SELECT 2)\nSELECT * FROM best_2"
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("w_0 AS MATERIALIZED ("))
    assert(out.contains("best_2 AS MATERIALIZED ("))
  }

  test("named WINDOW clauses are NOT rewritten") {
    val in = "WITH d AS (SELECT 1 AS x) SELECT SUM(x) OVER w FROM d WINDOW w AS (ORDER BY x)"
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("WINDOW w AS (ORDER BY x)"), out)
    assert(out.contains("d AS MATERIALIZED ("))
  }

  test("WITHIN and column aliases are untouched; subquery WITH rewrites") {
    val in = "SELECT x AS y FROM (WITH c AS (SELECT 1 AS x) SELECT * FROM c) t"
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("c AS MATERIALIZED ("))
    assert(out.contains("x AS y"))
  }

  test("every registered oracle rewrites without touching a WINDOW clause") {
    // The assembled map IS the rewritten surface; spot the invariants
    // that must hold for DuckDB to parse it.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("WINDOW w AS MATERIALIZED"),
        s"$name: named-window clause was corrupted")
      // Any WITH-led oracle must have at least one materialized CTE —
      // except the column-list form `WITH w(a, b) AS (VALUES ...)`,
      // which the rewrite deliberately leaves alone (a tiny VALUES
      // table gains nothing from materialization and the anchored
      // regex does not match the parenthesized name).
      val columnListCte = sql.trim.matches("(?s)(?i)WITH\\s+\\w+\\s*\\(.*")
      if (sql.trim.toUpperCase.startsWith("WITH") && !columnListCte)
        assert(sql.contains("AS MATERIALIZED ("),
          s"$name: WITH-led oracle has no materialized CTE")
    }
  }
}
