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

  test("round-16 composition queries hold their structural invariants on real data") {
    // the query-level-only entries (no dedicated operator spec) pinned
    // beyond the oracle: invariants that must hold at ANY scale factor
    val dir = "/root/testdata/sf0.001"
    // q301 LISTAGG: at most 5 pipe-joined names, no empty segments
    SparkEntry.queries("q301_listagg")(spark, dir).collect().foreach { r =>
      val parts = r.getString(2).split('|')
      assert(parts.length >= 1 && parts.length <= 5 &&
        parts.forall(_.nonEmpty), s"listagg row $r")
      assert(parts.length <= r.getLong(1), "top-5 cannot exceed group size")
    }
    // q303 fertility: BPE splits every word into >= 1 subword, so
    // fertility >= 1000 milli; chars-per-token positive when defined
    SparkEntry.queries("q303_tokenizer_fertility")(spark, dir)
      .collect().foreach { r =>
        if (!r.isNullAt(5)) assert(r.getLong(5) >= 1000L, s"fertility $r")
        if (!r.isNullAt(6)) assert(r.getLong(6) > 0L, s"chars/token $r")
      }
    // q310 decayed popularity: weight per event is in (0, 1e6], so the
    // decayed mass is bounded by n_events * 1e6 and strictly positive
    SparkEntry.queries("q310_decayed_popularity")(spark, dir)
      .collect().foreach { r =>
        val (n, age, d) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(d > 0L && d <= n * 1000000L && age >= 0L, s"decayed row $r")
      }
  }
}
