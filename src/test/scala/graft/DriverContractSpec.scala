package graft

/** Pins on the driver contract itself — a typo here fails silently at
  * round time (a query without an oracle degrades to a weaker check; an
  * oracle without a query is dead weight the checker may flag as a
  * missing dump).
  */
class DriverContractSpec extends SparkTestBase {

  test("every query has exactly one oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracle SQL without a query: ${(o -- q).toSeq.sorted}")
  }

  test("query names follow the qNN_snake convention and are unique by number") {
    val names = SparkEntry.queries.keySet.toSeq
    val pat = "^q(\\d{2,3})_[a-z0-9_]+$".r
    val nums = names.map {
      case pat(n) => n.toInt
      case bad => fail(s"query name '$bad' breaks the qNN_snake convention")
    }
    assert(nums.distinct.size == nums.size, "duplicate query numbers")
  }

  test("every oracle ends in a total ORDER BY (row order must never matter)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.contains("ORDER BY"),
        s"$name oracle has no ORDER BY — the hash compare is order-sensitive")
    }
  }

  test("oracle SQL contains no tab or carriage-return control characters") {
    // Verify escapes them correctly, but builder-authored SQL should not
    // need escaping in the first place — a tab usually means a paste error
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.exists(c => c == '\t' || c == '\r'),
        s"$name oracle contains tab/CR control characters")
    }
  }
}
