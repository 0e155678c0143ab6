package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static determinism lint over the DuckDB oracle SQL surface.
  *
  * Round-10 lesson: 9 of the 10 driver-red queries had oracle output
  * columns typed HUGEINT (an uncast integer `SUM(...)` — DuckDB widens
  * integer sums to int128). Different duckdb client versions convert
  * HUGEINT differently (int64 vs float64 vs decimal128), so the values
  * match but the driver's representation hash doesn't. The rule:
  * every integer SUM that reaches an output column must be
  * `CAST(... AS BIGINT)`.
  *
  * This spec enforces the DIRECT shape (`SUM(<integer expr>) AS alias`
  * in the final SELECT) statically with zero false positives on the
  * round-10 green set. The definitive, passthrough-proof gate is the
  * DESCRIBE lint in tools/check.py, which types every output column
  * with DuckDB itself — run it per round.
  */
class OracleLintSpec extends AnyFunSuite {

  /** Positions where `kw` occurs at paren-depth 0 in `s`. */
  private def topLevel(s: String, kw: String): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && s.regionMatches(true, i, kw, 0, kw.length))
        out += i
      i += 1
    }
    out.result()
  }

  /** Output-column expressions of the LAST top-level SELECT. */
  private def finalSelectCols(sql: String): Seq[String] = {
    val s = sql.replaceAll("\\s+", " ").trim
    val sels = topLevel(s, "SELECT ")
    if (sels.isEmpty) return Seq.empty
    val start = sels.last + 7
    val rest = s.substring(start)
    val froms = topLevel(rest, " FROM ")
    val colsStr = if (froms.isEmpty) rest else rest.substring(0, froms.head)
    val cols = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    colsStr.foreach {
      case ',' if depth == 0 => cols += cur.toString; cur.clear()
      case c =>
        if (c == '(') depth += 1
        if (c == ')') depth -= 1
        cur += c
    }
    cols += cur.toString
    cols.result().map(_.trim)
  }

  /** True when `c` is `SUM(<integer expr>) AS alias` with no CAST. */
  private def isUncastIntSum(c: String): Boolean = {
    if (!c.toUpperCase.startsWith("SUM(")) return false
    var depth = 0
    var close = -1
    var i = 3
    while (i < c.length && close < 0) {
      val ch = c.charAt(i)
      if (ch == '(') depth += 1
      else if (ch == ')') { depth -= 1; if (depth == 0) close = i }
      i += 1
    }
    if (close < 0) return false
    val rest = c.substring(close + 1).trim
    if (!rest.matches("(?i)AS\\s+(\\w+|\"[^\"]+\")")) return false
    val inner = c.substring(4, close)
    // double/decimal sums are a different (value-level) concern; this
    // lint targets the integer-sum HUGEINT type drift only
    !inner.toUpperCase.matches("(?s).*(DOUBLE|DECIMAL).*") &&
      !inner.matches("(?s).*[0-9]\\.[0-9].*")
  }

  test("no oracle final-select column is an uncast integer SUM") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        finalSelectCols(sql).filter(isUncastIntSum)
          .map(c => s"$name: ${c.take(80)}")
    }
    assert(bad.isEmpty,
      s"\nuncast integer SUM output (HUGEINT drift — CAST AS BIGINT):\n" +
        bad.mkString("\n"))
  }

  test("lint detects the round-10 failure shape (self-check)") {
    val redShape =
      """WITH g AS (SELECT 1 AS x)
        SELECT COUNT(*) AS n,
          SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS n_pos
        FROM g"""
    assert(finalSelectCols(redShape).count(isUncastIntSum) == 1)
    val fixedShape =
      """WITH g AS (SELECT 1 AS x)
        SELECT COUNT(*) AS n,
          CAST(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        FROM g"""
    assert(finalSelectCols(fixedShape).count(isUncastIntSum) == 0)
  }
}
