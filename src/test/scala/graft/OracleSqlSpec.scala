package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide invariants on the oracle SQL strings themselves (no Spark
  * session needed).
  *
  * The load-bearing one: [[SparkEntry.materializeCtes]] is a blanket textual
  * rewrite (`name AS (SELECT` → `name AS MATERIALIZED (SELECT`) applied to
  * EVERY oracle before DuckDB runs it. DuckDB cannot materialize a recursive
  * CTE, so the rewrite is only safe while no self-referencing CTE head
  * matches the pattern — i.e. every recursive CTE must carry a column list
  * (`name(col, …) AS (`), which the regex does not match. That invariant
  * held by convention; this spec makes it a failing test instead of a
  * silent future `Binder Error` in the driver's gate. */
class OracleSqlSpec extends AnyFunSuite {

  /** Body of the paren group opening at `open` (index of '('), exclusive. */
  private def parenBody(sql: String, open: Int): String = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return sql.substring(open + 1, i)
        case _ =>
      }
      i += 1
    }
    sql.substring(open + 1) // unbalanced — caller's other asserts will trip
  }

  private val HeadPattern = """(\w+) AS \(SELECT""".r

  test("materializeCtes never materializes a self-referencing CTE") {
    for ((qname, sql) <- SparkEntry.oracleSqlRaw
         if sql.contains("WITH RECURSIVE")) {
      for (m <- HeadPattern.findAllMatchIn(sql)) {
        val cte = m.group(1)
        val body = parenBody(sql, sql.indexOf('(', m.start + cte.length))
        assert(!s"\\b${java.util.regex.Pattern.quote(cte)}\\b".r
            .findFirstIn(body).isDefined,
          s"$qname: recursive statement declares CTE '$cte' WITHOUT a " +
            "column list but its body references itself — materializeCtes " +
            "would rewrite it to AS MATERIALIZED, which DuckDB rejects on " +
            "recursive CTEs. Declare it as '" + cte + "(col, …) AS (…)'.")
      }
    }
  }

  test("materializeCtes rewrites exactly the bare heads") {
    val in = "WITH a AS (SELECT 1), b(x) AS (SELECT 2) SELECT * FROM a, b"
    assert(SparkEntry.materializeCtes(in) ===
      "WITH a AS MATERIALIZED (SELECT 1), b(x) AS (SELECT 2) " +
        "SELECT * FROM a, b")
  }

  test("every registry query with an oracle has round-trippable SQL") {
    // cheap structural sanity over the whole registry: balanced parens
    for ((qname, sql) <- SparkEntry.oracleSqlRaw) {
      val depth = sql.foldLeft(0) {
        case (d, '(') => d + 1
        case (d, ')') => d - 1
        case (d, _)   => d
      }
      assert(depth === 0, s"$qname: unbalanced parentheses in oracle SQL")
    }
  }
}
