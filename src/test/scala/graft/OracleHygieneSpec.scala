package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DuckSql

/** Pins the oracle-cost protections that keep the driver's DuckDB gate
  * alive (round 11 shipped an EMPTY correctness artifact because one
  * un-materialized oracle family starved it — see
  * [[DuckSql.materialize]]). `tools/oracle_bench.py` is the runtime
  * tripwire; these are the static ones. */
class OracleHygieneSpec extends AnyFunSuite {

  test("materialize rewrites CTEs, skips named-window clauses, idempotent") {
    val in =
      """WITH a AS (SELECT 1 AS x), b AS
        |  (SELECT x, COUNT(*) OVER w AS c FROM a WINDOW w AS (PARTITION BY x))
        |SELECT CAST(x AS BIGINT) FROM b, UNNEST(range(0, 2)) AS t(i)""".stripMargin
    val out = DuckSql.materialize(in)
    assert(out.contains("WITH a AS MATERIALIZED (SELECT 1 AS x)"))
    assert(out.contains("b AS MATERIALIZED \n  (SELECT") ||
      out.contains("b AS MATERIALIZED (SELECT"))
    // the named-window clause must stay plain `AS (` — MATERIALIZED
    // there is a DuckDB syntax error
    assert(out.contains("WINDOW w AS (PARTITION BY x)"))
    // non-CTE AS forms untouched
    assert(out.contains("CAST(x AS BIGINT)"))
    assert(out.contains("AS t(i)"))
    assert(DuckSql.materialize(out) == out, "materialize must be idempotent")
  }

  test("every shipped oracle is fully materialized (SparkEntry choke point)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(DuckSql.materialize(sql) == sql,
        s"$name reached the driver with un-materialized CTEs")
    }
  }

  test("no oracle uses a multi-window WINDOW list (materialize's blind spot)") {
    // `WINDOW w AS (...), v AS (...)`: the lookbehind guard only sees
    // the first entry, so the 2nd+ would get MATERIALIZED → syntax
    // error in DuckDB. Single-window clauses are what the codebase
    // uses; pin it so a future multi-window oracle fails here instead
    // of starving the driver's gate with parse errors. The window spec
    // is skipped with a balanced-paren scan (a regex [^)]* would stop
    // at the first ')' of a nested call like PARTITION BY coalesce(x,0)
    // and miss the second entry).
    val windowHead = """(?is)\bWINDOW\s+\w+\s+AS\s*\(""".r
    def hasSecondEntry(sql: String, openIdx: Int): Boolean = {
      var i = openIdx; var depth = 0
      while (i < sql.length) {
        sql.charAt(i) match {
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) {
              // the SQL under test is POST-materialize (oracleSql maps
              // through DuckSql.materialize), so a second window entry
              // arrives as either `v AS (` (guard somehow skipped it)
              // or `v AS MATERIALIZED (` (guard corrupted it — the
              // actual hazard); match both or the tripwire passes
              // exactly when the failure it pins has occurred
              val rest = sql.substring(i + 1)
              return rest.matches("""(?is)\s*,\s*\w+\s+AS\s+(MATERIALIZED\s*)?\(.*""")
            }
          case _ => ()
        }
        i += 1
      }
      false
    }
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      windowHead.findAllMatchIn(sql).foreach { m =>
        assert(!hasSecondEntry(sql, sql.indexOf('(', m.start)),
          s"$name uses a multi-window WINDOW list; extend DuckSql.materialize first")
      }
    }
  }

  test("every WINDOW clause sits inside materialize's lookbehind bound") {
    // DuckSql.materialize's named-window exclusion is a BOUNDED
    // lookbehind: `WINDOW` + ≤8 ws + name ≤40 chars + ≤8 ws before the
    // `AS`. A future line-wrapped or padded window head (e.g.
    // `WINDOW\n         w AS (`, 9+ ws) escapes the guard, gets
    // `AS MATERIALIZED (` — a DuckDB syntax error — and the
    // idempotence test above can't see it (the corrupted text is a
    // fixed point). Pin statically: every `WINDOW` keyword followed by
    // an AS-parenthesis must match the exact protected shape. The SQL
    // under test is post-materialize, so the corrupted form
    // (`AS MATERIALIZED (`) is itself a violation this catches.
    val anyWindow = """(?is)\bWINDOW\b(?!\s{1,8}\w{1,40}\s{1,8}AS\s*\()""".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      anyWindow.findFirstMatchIn(sql).foreach { m =>
        val ctx = sql.substring(m.start, math.min(sql.length, m.start + 60))
        fail(s"$name has a WINDOW clause outside materialize's lookbehind " +
          s"bound (would be corrupted to AS MATERIALIZED): …$ctx…")
      }
    }
  }
}
