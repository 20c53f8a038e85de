package graft

/** Driver-contract sanity: the properties the grading driver depends on but
  * nothing else would catch until a round burns on them. */
class ContractSpec extends SparkSpec {

  test("query names are unique across all operator families") {
    val names = SparkEntry.allQueries.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  test("every oracle key has a matching query; no orphaned oracles") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("flagship entry returns rows (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL strings are DuckDB-shaped: no Spark-only function slipped in") {
    // cheap lint for the cross-engine traps that cost rounds before:
    // Spark-only names and un-flagged regexp_replace calls
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("xxhash64"), s"$name: xxhash64 is Spark-only")
      assert(!sql.contains("get_json_object"), s"$name: get_json_object is Spark-only")
      // Balanced-paren scan per call site (nested calls defeat a flat regex).
      // A call may omit 'g' only when its pattern is anchored (^... or ...$),
      // i.e. matches at most once by construction.
      val bad = "regexp_replace\\(".r.findAllMatchIn(sql).flatMap { m =>
        var i = m.end; var depth = 1
        while (depth > 0 && i < sql.length) {
          sql(i) match { case '(' => depth += 1; case ')' => depth -= 1; case _ => }
          i += 1
        }
        val call = sql.substring(m.start, i)
        val flagged = call.endsWith("'g')")
        val anchored = call.contains("'^") || call.contains("$'")
        if (flagged || anchored) None else Some(call.take(80))
      }.toList
      assert(bad.isEmpty,
        s"$name: regexp_replace without 'g' on unanchored pattern " +
          s"(DuckDB replaces FIRST match only): $bad")
    }
  }

  test("oracle integer divisions over sum() are explicitly CAST (DuckDB HUGEINT trap)") {
    // DuckDB's sum(BIGINT) — plain or windowed — returns HUGEINT, and any
    // arithmetic touching it (notably `//`) stays HUGEINT, which pandas
    // round-trips as float64 while Spark emits BIGINT; the driver's
    // dtype-sensitive hash then fails (round-5 q_event_transitions).
    // Rule: a `//` whose operand expression mentions sum() must sit inside
    // a CAST(... AS <int>). Plain small-int divisions (e.g. nibble masks
    // inside sum()'s own argument) stay INTEGER and are exempt.
    def insideCast(sql: String, pos: Int): Boolean = {
      // walk left from pos; each time nesting depth drops below zero we've
      // found an enclosing '(' — check whether the word before it is CAST
      var i = pos - 1
      var depth = 0
      while (i >= 0) {
        sql(i) match {
          case ')' => depth += 1
          case '(' =>
            if (depth == 0) {
              val head = sql.substring(0.max(i - 4), i).toUpperCase
              if (head.endsWith("CAST")) return true
              // keep scanning for an outer enclosing paren
            } else depth -= 1
          case _ =>
        }
        i -= 1
      }
      false
    }
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_' || c == '.'
    // the text of the operand immediately left of the `//` at [start,end);
    // walks through window clauses: `sum(b) OVER (...)` is ONE operand
    def leftOperand(sql: String, start: Int): String = {
      var i = start - 1
      while (i >= 0 && sql(i).isWhitespace) i -= 1
      if (i < 0) return ""
      val end = i + 1
      var continue = true
      while (continue) {
        continue = false
        if (i >= 0 && sql(i) == ')') {
          var depth = 1; i -= 1
          while (i >= 0 && depth > 0) {
            sql(i) match { case ')' => depth += 1; case '(' => depth -= 1; case _ => }
            i -= 1
          }
          // include a function name before the '(' (e.g. sum(...)); there
          // may be whitespace between the name and the paren (OVER (...))
          while (i >= 0 && sql(i).isWhitespace) i -= 1
          val identEnd = i + 1
          while (i >= 0 && isIdent(sql(i))) i -= 1
          // `... ) OVER (...)`: the paren group was a window spec — keep
          // walking left to pick up the aggregate call it modifies
          if (sql.substring(i + 1, identEnd).equalsIgnoreCase("over")) {
            while (i >= 0 && sql(i).isWhitespace) i -= 1
            continue = true
          }
        } else {
          while (i >= 0 && isIdent(sql(i))) i -= 1
        }
      }
      sql.substring(i + 1, end)
    }
    def rightOperand(sql: String, end: Int): String = {
      var i = end
      while (i < sql.length && sql(i).isWhitespace) i += 1
      val start = i
      if (i < sql.length && isIdent(sql(i))) {
        while (i < sql.length && isIdent(sql(i))) i += 1 // fn name or ident
      }
      if (i < sql.length && sql(i) == '(') {
        var depth = 1; i += 1
        while (i < sql.length && depth > 0) {
          sql(i) match { case '(' => depth += 1; case ')' => depth -= 1; case _ => }
          i += 1
        }
      }
      sql.substring(start, i)
    }
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val lower = (t: String) => t.toLowerCase
      val uncast = "//".r.findAllMatchIn(sql)
        .filter { m =>
          val touchesSum = lower(leftOperand(sql, m.start)).contains("sum(") ||
            lower(rightOperand(sql, m.end)).contains("sum(")
          touchesSum && !insideCast(sql, m.start)
        }
        .map(m => sql.slice(0.max(m.start - 40), (sql.length).min(m.start + 40))
          .replaceAll("\\s+", " "))
        .toList
      assert(uncast.isEmpty,
        s"$name: integer division `//` over a sum() operand not wrapped in " +
          s"CAST(... AS BIGINT) — DuckDB HUGEINT arithmetic reaches pandas " +
          s"as float64 and the driver's dtype-sensitive hash fails: $uncast")
    }
  }
}
