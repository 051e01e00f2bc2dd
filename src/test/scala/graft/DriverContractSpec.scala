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

  test("no query emits a DecimalType output column (driver hash canonicalization)") {
    // Round-14 lesson: the driver hashes Spark's parquet Decimal('1.20')
    // and DuckDB's pandas-degraded float 1.2 differently whenever a value
    // has trailing zeros — rows/schema match, hash fails, and the failure
    // is DATA-dependent (queries pass or fail by value luck). Money/ratio
    // lanes must be BIGINT fixed-point (cents / 1e-4 units, q227 idiom).
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val decCols = fn(spark, dir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] => f.name
      }
      if (decCols.nonEmpty) Some(s"$name: ${decCols.mkString(",")}") else None
    }
    assert(offenders.isEmpty,
      s"DecimalType output columns (driver-red on trailing zeros): $offenders")
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
