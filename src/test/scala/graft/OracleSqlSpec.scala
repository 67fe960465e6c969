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

  test("MULTI-window clauses are NOT rewritten (ADVICE r14: the comma anchor must not reach w2)") {
    // `WINDOW w1 AS (...), w2 AS (...)` shares the `, name AS (` shape
    // with a CTE list; a comma-anchored rewrite of w2 would produce
    // SQL DuckDB rejects. The window-span scanner must cover the WHOLE
    // clause, commas included — and still rewrite real CTEs around it.
    val in = "WITH d AS (SELECT 1 AS x, 2 AS y) " +
      "SELECT SUM(x) OVER w1, AVG(y) OVER w2 FROM d " +
      "WINDOW w1 AS (ORDER BY x), w2 AS (PARTITION BY y ORDER BY x ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)"
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("WINDOW w1 AS (ORDER BY x), w2 AS (PARTITION BY y"), out)
    assert(!out.contains("w2 AS MATERIALIZED"), out)
    assert(out.contains("d AS MATERIALIZED ("))
    // Nested parens inside a window definition don't derail the scan,
    // and a CTE list CONTINUING in a later statement position still
    // rewrites.
    val in2 = "WITH a AS (SELECT 1 AS x) SELECT x FROM a " +
      "WINDOW w1 AS (ORDER BY (x + (x * 2))), w2 AS (ORDER BY x)"
    val out2 = OracleSql.materializeCtes(in2)
    assert(out2.contains("a AS MATERIALIZED ("))
    assert(!out2.contains("w1 AS MATERIALIZED") &&
      !out2.contains("w2 AS MATERIALIZED"), out2)
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
      // ADVICE r14 guard, generalized beyond the literal `WINDOW w`:
      // NOTHING between any WINDOW keyword and its statement boundary
      // (the next SELECT / ORDER BY / closing paren at this nesting
      // level — approximated conservatively as "until the next newline
      // that starts a new clause or end of string") may carry the
      // MATERIALIZED hint. Since window clauses never CONTAIN a
      // sub-WITH in this corpus, the simple form is: no occurrence of
      // "MATERIALIZED" after the LAST "WINDOW" keyword of any
      // statement unless a WITH intervenes.
      """(?i)\bWINDOW\b""".r.findAllMatchIn(sql).foreach { w =>
        val tail = sql.substring(w.end)
        val end = """(?i)\bWITH\b""".r.findFirstMatchIn(tail)
          .map(_.start).getOrElse(tail.length)
        assert(!tail.substring(0, end).toUpperCase.contains("MATERIALIZED"),
          s"$name: MATERIALIZED after a WINDOW keyword (offset ${w.start}) " +
            "with no intervening WITH — a window definition was corrupted")
      }
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
