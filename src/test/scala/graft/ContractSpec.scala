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
}
