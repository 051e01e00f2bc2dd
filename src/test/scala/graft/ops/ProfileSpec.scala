package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("profile: null counts, exact distincts, min/max per column in long form") {
    val df = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), None),
      (3L, Some("a"), Some(-5L)),
      (4L, None, Some(10L))
    ).toDF("id", "s", "v")
    val rows = Profile.profile(df, Seq(
      "id" -> col("id"), "s" -> col("s"), "v" -> col("v")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(rows("id") == ((4L, 0L, 4L, "1", "4")))
    assert(rows("s") == ((4L, 1L, 2L, "a", "b")))
    assert(rows("v") == ((4L, 1L, 2L, "-5", "10")))
  }

  test("profile: an all-NULL column reports NULL min/max and 0 distincts") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val r = Profile.profile(df, Seq("s" -> col("s"))).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("histogram: +1-span binning keeps the max in the last bucket; observed bounds") {
    // values 0..9, 5 buckets over span 10 -> pairs {0,1},{2,3},...,{8,9}
    val df = (0L to 9L).toDF("v")
    val got = Profile.histogram(df, col("v"), 5)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == (0L to 4L).map(b => (b, 2L, 2 * b, 2 * b + 1)).toList, s"got $got")
    // skewed span: 3 values over [0, 100], 4 buckets — max lands in
    // bucket 3 ((100*4)//101), no clamp, empty buckets not emitted
    val skew = Seq(0L, 1L, 100L).toDF("v")
    val got2 = Profile.histogram(skew, col("v"), 4)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect().toList
    assert(got2 == List((0L, 2L, 0L, 1L), (3L, 1L, 100L, 100L)), s"got $got2")
    // all-NULL column -> empty histogram, not a crash
    assert(Profile.histogram(Seq(Option.empty[Long]).toDF("v"), col("v"), 3)
      .count() == 0L)
    // negative domain: lo anchors at the minimum, numerator stays >= 0;
    // span 16 over 2 buckets splits at -2|-1 (-1 -> (9*2)//16 = 1)
    val neg = Seq(-10L, -1L, 5L).toDF("v")
    val got3 = Profile.histogram(neg, col("v"), 2)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect().toList
    assert(got3 == List((0L, 1L, -10L, -10L), (1L, 2L, -1L, 5L)), s"got $got3")
    // full long domain: span = 2^64 and (v-lo)*buckets both exceed BIGINT —
    // the DECIMAL(38,0) intermediates keep the binning exact, no wraparound
    val wide = Seq(Long.MinValue, 0L, Long.MaxValue).toDF("v")
    val got4 = Profile.histogram(wide, col("v"), 2)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect().toList
    assert(got4 == List(
      (0L, 1L, Long.MinValue, Long.MinValue),
      (1L, 2L, 0L, Long.MaxValue)), s"got $got4")
  }

  test("checkConstraints: NULL predicate is a violation, ppm exact, one pass") {
    val df = Seq(
      (Some(10L), Some("ok")),
      (Some(-1L), Some("ok")),    // violates positive
      (None, Some("ok")),         // NULL value -> positive is NULL -> violation
      (Some(5L), None)            // NULL tag -> domain is NULL -> violation
    ).toDF("v", "tag")
    val got = Profile.checkConstraints(df, Seq(
        "positive" -> (col("v") > 0),
        "tag_domain" -> col("tag").isin("ok", "meh"),
        "tag_nullable_ok" -> (col("tag").isNull || col("tag").isin("ok", "meh"))))
      .orderBy("constraint")
      .as[(String, Long, Long, Long)].collect().toList
    assert(got == List(
      ("positive", 4L, 2L, 500000L),
      ("tag_domain", 4L, 1L, 250000L),
      ("tag_nullable_ok", 4L, 0L, 0L)), s"got $got")
    // empty table: defined zeros, not NULL/division blowups
    val empty = Profile.checkConstraints(
        Seq.empty[(Option[Long], Option[String])].toDF("v", "tag"),
        Seq("positive" -> (col("v") > 0)))
      .as[(String, Long, Long, Long)].collect().toList
    assert(empty == List(("positive", 0L, 0L, 0L)), s"got $empty")
  }

  test("topValues: NULL is countable, ties pin on value, rank cut per column") {
    val df = Seq(
      (Some("a"), 1L), (Some("a"), 2L), (Some("b"), 1L), (None, 1L), (None, 2L)
    ).toDF("s", "x")
    val got = Profile.topValues(df,
        Seq("s" -> col("s"), "x" -> col("x")), k = 2)
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
      .toSet
    // s: a=2, NULL=2, b=1 — tie a vs NULL at n=2 pins NULLS FIRST
    assert(got.contains(("s", None, 2L, 1L)))
    assert(got.contains(("s", Some("a"), 2L, 2L)))
    assert(!got.exists(r => r._1 == "s" && r._2 == Some("b")), "k=2 cuts b")
    // x: 1=3, 2=2
    assert(got.contains(("x", Some("1"), 3L, 1L)))
    assert(got.contains(("x", Some("2"), 2L, 2L)))
  }

  test("nullRateDaily: per-day per-column counters in one pass; no-ts rows excluded") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (ts("2024-01-01 10:00:00"), Some(1L), Some("x")),
      (ts("2024-01-01 11:00:00"), None, Some("y")),
      (ts("2024-01-02 10:00:00"), None, None),
      (null.asInstanceOf[java.sql.Timestamp], Some(9L), Some("z")) // no day
    ).toDF("ts", "a", "b")
    val got = Profile.nullRateDaily(df, col("ts"),
        Seq("a" -> col("a"), "b" -> col("b")))
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val d1 = ts("2024-01-01 00:00:00").getTime / 1000 / 86400
    assert(got((d1, "a")) == ((2L, 1L, 500000L)), s"got $got")
    assert(got((d1, "b")) == ((2L, 0L, 0L)))
    assert(got((d1 + 1, "a")) == ((1L, 1L, 1000000L)))
    assert(got((d1 + 1, "b")) == ((1L, 1L, 1000000L)))
    assert(got.size == 4, "the no-timestamp row must contribute no day")
  }

  test("joinSizeForecast: exact sum of count products, never runs the join") {
    val left = Seq("hot", "hot", "hot", "a", "b", "b").toDF("k")
    val right = Seq("hot", "hot", "a", "c").toDF("k")
    val got = Profile.joinSizeForecast(left, col("k"), right, col("k"), topN = 5)
      .select("k", "n_left", "n_right", "rows_out", "rk", "total_rows", "share_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
    // hot: 3*2=6, a: 1*1=1; b and c never match -> total 7
    assert(got == List(
      ("hot", 3L, 2L, 6L, 1L, 7L, 857142L),
      ("a", 1L, 1L, 1L, 2L, 7L, 142857L)), s"got $got")
    // cross-check against the real join size
    assert(left.join(right, "k").count() == 7L)
  }

  test("shuffleBalance: deterministic buckets, NULL keys isolated, counts reconcile") {
    val df = ((1 to 100).map(i => Option((i % 10).toLong)) ++ Seq(None, None))
      .toDF("k")
    val got = Profile.shuffleBalance(df, col("k"), buckets = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(-1L) == ((2L, 0L)), "NULL keys get their own bucket with 0 distinct")
    assert(got.filterKeys(_ >= 0).values.map(_._1).sum == 100L)
    assert(got.filterKeys(_ >= 0).values.map(_._2).sum == 10L,
      "each distinct key lands in exactly one bucket")
    // determinism: a second run buckets identically
    val again = Profile.shuffleBalance(df, col("k"), buckets = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == got)
  }

  test("profile: single aggregate job — the multi-distinct plans as one Expand") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val plan = Profile.profile(df, Seq("id" -> col("id"), "s" -> col("s")))
      .queryExecution.executedPlan.toString
    // one Expand for the N distinct aggregates, not N separate jobs/unions
    assert(plan.split("Expand").length - 1 == 1, s"expected exactly 1 Expand:\n$plan")
    assert(!plan.contains("Union"), s"expected no per-column union:\n$plan")
  }

  test("benfordAudit: cents leading digit, exclusions, floored ppm shares") {
    val vals = Seq(
      Some(1.23),    // 123 cents  -> digit 1
      Some(19.99),   // 1999       -> digit 1
      Some(0.02),    // 2          -> digit 2
      Some(900.00),  // 90000      -> digit 9
      Some(0.0),     // non-positive -> excluded
      Some(-5.0),    // excluded
      None           // excluded
    ).toDF("v")
    val got = Profile.benfordAudit(vals, col("v")).orderBy("digit")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(got == List(
      (1L, 2L, 500000L, 301029L, 198971L),
      (2L, 1L, 250000L, 176091L, 73909L),
      (9L, 1L, 250000L, 45757L, 204243L)), s"got $got")
  }

  test("kAnonymize picks the first level where every class reaches k; falls back to last") {
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 2L), ("a", 2L),
      ("b", 3L), ("b", 3L), ("b", 4L), ("b", 4L)
    ).toDF("g", "sub")
    val levels = Seq(
      Seq(col("g"), col("sub")),     // classes of 2 -> risky at k=3
      Seq(col("g"), col("sub") % 2), // parity buckets: still classes of 2
      Seq(col("g"), lit(0L)),        // classes of 4 -> first to satisfy k=3
      Seq(lit("*"), lit(0L)))        // full suppression (guaranteed last resort)
    val out = Profile.kAnonymize(df, Seq("g", "sub"), levels, k = 3)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("a", 0L, 4L, 2L), ("b", 0L, 4L, 2L)))

    // k larger than the table: no level satisfies -> last level released
    val fb = Profile.kAnonymize(df, Seq("g", "sub"), levels, k = 100)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(fb == Set(("*", 0L, 8L, 3L)))

    // k = 1 accepts the finest level untouched
    val fine = Profile.kAnonymize(df, Seq("g", "sub"), levels, k = 1)
    assert(fine.select("level").distinct().as[Long].collect().toList == List(0L))
    assert(fine.count() == 4)
  }

  test("lDiversify rejects a k-accepting level whose class is sensitive-homogeneous") {
    // group "a" holds 4 rows but ONE disease value — k=3 accepts level 0,
    // l=2 must not (the homogeneity attack): the walk goes to suppression
    val df = Seq(
      ("a", "flu"), ("a", "flu"), ("a", "flu"), ("a", "flu"),
      ("b", "flu"), ("b", "cold"), ("b", "cold"), ("b", "acne")
    ).toDF("g", "disease")
    val levels = Seq(Seq(col("g")), Seq(lit("*")))
    val kOnly = Profile.kAnonymize(df, Seq("g"), levels, k = 3)
    assert(kOnly.select("level").distinct().as[Long].collect().toList == List(0L))

    val out = Profile.lDiversify(df, Seq("g"), levels,
        sensitiveCol = col("disease"), k = 3, l = 2)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("*", 8L, 3L, 1L)))

    // l = 1 degenerates to plain k-anonymity: level 0 released with
    // per-class distinct-sensitive counts carried through
    val l1 = Profile.lDiversify(df, Seq("g"), levels,
        sensitiveCol = col("disease"), k = 3, l = 1)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(l1 == Set(("a", 4L, 1L, 0L), ("b", 4L, 3L, 0L)))
  }

  test("tCloseness rejects an l-diverse level whose class distribution is skewed") {
    import org.apache.spark.sql.functions.{col, lit}
    // global: 8 flu, 8 cold (TV anchor is 50/50). group "a" is 7 flu /
    // 1 cold: l-diversity (l=2) accepts it, but TV = |7/8-1/2| = 0.375
    // rejects at t=0.25 (250000 ppm) -> the skew leak
    val df = Seq.fill(7)(("a", "flu")) ++ Seq(("a", "cold")) ++
      Seq.fill(1)(("b", "flu")) ++ Seq.fill(7)(("b", "cold"))
    val d = df.toDF("g", "disease")
    val levels = Seq(Seq(col("g")), Seq(lit("*")))
    val ldiv = Profile.lDiversify(d, Seq("g"), levels,
      sensitiveCol = col("disease"), k = 3, l = 2)
    assert(ldiv.select("level").distinct().as[Long].collect().toList == List(0L),
      "l-diversity must accept the skewed level (that's the leak)")

    val out = Profile.tCloseness(d, Seq("g"), levels,
        sensitiveCol = col("disease"), k = 3, tPpm = 250000L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("*", 16L, 0L, 1L)), s"skew must force suppression: $out")

    // a loose t accepts level 0 and reports the exact per-class tv_ppm:
    // both classes are 0.375 from the global 50/50 -> 375000 ppm
    val loose = Profile.tCloseness(d, Seq("g"), levels,
        sensitiveCol = col("disease"), k = 3, tPpm = 375000L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(loose == Set(("a", 8L, 375000L, 0L), ("b", 8L, 375000L, 0L)),
      s"got $loose")

    // boundary exactness: t one ppm under the true TV must reject —
    // the cleared-inequality test, not a floored-ppm comparison
    val boundary = Profile.tCloseness(d, Seq("g"), levels,
        sensitiveCol = col("disease"), k = 3, tPpm = 374999L)
      .select("level").distinct().as[Long].collect().toList
    assert(boundary == List(1L), s"one ppm under must reject: $boundary")
  }

  test("joinFanout predicts the exact join size; unmatched keys don't contribute") {
    val left = Seq("a", "a", "a", "b", "c").toDF("k")
    val right = Seq("a", "a", "b", "b", "b", "d").toDF("k")
    val out = Profile.joinFanout(left, right, col("k"), col("k"), topK = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // a: 3*2=6, b: 1*3=3; c and d unmatched; topK=1 keeps only a
    assert(out == Set(("a", 3L, 2L, 6L), ("__total__", 4L, 5L, 9L)))

    // the forecast equals the real join's size
    val real = left.join(right, Seq("k")).count()
    assert(real == 9L)

    // disjoint keys: empty top, zeroed total
    val none = Profile.joinFanout(Seq("x").toDF("k"), Seq("y").toDF("k"),
      col("k"), col("k")).collect().map(r =>
        (r.getString(0), r.getLong(3))).toSet
    assert(none == Set(("__total__", 0L)))
  }

  test("contentManifest: order-independent, key-bound, content-sensitive") {
    val rows = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
    val m1 = Profile.contentManifest(rows.toDF("id", "text"),
      col("id"), col("text"), nShards = 4)
      .as[(Long, Long, Long)].collect().toSet
    // same rows, different order and partitioning -> identical manifest
    val m2 = Profile.contentManifest(
      rows.reverse.toDF("id", "text").repartition(7),
      col("id"), col("text"), nShards = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(m1 == m2 && m1.toSeq.map(_._2).sum == 4L)

    // swapping two rows' contents keeps the content multiset but MUST
    // change the manifest (fingerprints are key-bound)
    val swapped = Seq((1L, "beta"), (2L, "alpha"), (3L, "gamma"), (4L, "delta"))
    val m3 = Profile.contentManifest(swapped.toDF("id", "text"),
      col("id"), col("text"), nShards = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(m3 != m1)

    // one flipped character is visible in exactly the damaged shards
    val damaged = Seq((1L, "alphA"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
    val m4 = Profile.contentManifest(damaged.toDF("id", "text"),
      col("id"), col("text"), nShards = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(m4 != m1 && m4.map(t => (t._1, t._2)) == m1.map(t => (t._1, t._2)))
  }
}
