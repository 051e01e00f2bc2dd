package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BehaviorSpec extends SparkTestBase {
  import spark.implicits._

  test("scdType2 collapses repeats and closes intervals with the next change") {
    val log = Seq(
      (1L, ts("2026-01-01 00:00:00"), "a", 1L),
      (1L, ts("2026-01-02 00:00:00"), "a", 2L), // repeat -> collapses
      (1L, ts("2026-01-03 00:00:00"), "b", 3L),
      (1L, ts("2026-01-04 00:00:00"), "b", 4L), // repeat -> collapses
      (1L, ts("2026-01-05 00:00:00"), "a", 5L), // back to a: NEW interval
      (2L, ts("2026-01-01 00:00:00"), null, 1L) // null attr opens fine
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Behavior.scdType2(log,
        col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .orderBy("key", "valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "a", ts("2026-01-01 00:00:00"), Some(ts("2026-01-03 00:00:00")), false),
      (1L, "b", ts("2026-01-03 00:00:00"), Some(ts("2026-01-05 00:00:00")), false),
      (1L, "a", ts("2026-01-05 00:00:00"), None, true),
      (2L, null, ts("2026-01-01 00:00:00"), None, true)))
  }

  test("scdType2 breaks equal-timestamp ties deterministically on seq") {
    val log = Seq(
      (1L, ts("2026-01-01 00:00:00"), "y", 2L),
      (1L, ts("2026-01-01 00:00:00"), "x", 1L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Behavior.scdType2(log,
        col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .orderBy("valid_from", "attr")
      .select("attr", "is_current").as[(String, Boolean)].collect().toSeq
    // seq order x then y: x's interval closes at the same instant,
    // y stays current
    assert(got == Seq(("x", false), ("y", true)))
  }

  test("scd2Apply: merge equals full rebuild across the boundary cases") {
    // boundary collapse (key 1: batch value equals open value), real
    // change (key 2), untouched key (3), brand-new key (4)
    val before = Seq(
      (1L, ts("2026-01-01 00:00:00"), "a", 1L),
      (1L, ts("2026-01-02 00:00:00"), "b", 2L),
      (2L, ts("2026-01-01 00:00:00"), "x", 3L),
      (3L, ts("2026-01-01 00:00:00"), "z", 4L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val batch = Seq(
      (1L, ts("2026-01-10 00:00:00"), "b", 5L), // repeat of open value -> collapses
      (1L, ts("2026-01-11 00:00:00"), "c", 6L),
      (2L, ts("2026-01-10 00:00:00"), "y", 7L),
      (4L, ts("2026-01-10 00:00:00"), "n", 8L)  // new key
    ).toDF("user_id", "ts", "event_type", "event_id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("key", "valid_from", "attr")
        .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    val dim = Behavior.scdType2(before,
      col("user_id"), col("ts"), col("event_type"), col("event_id"))
    val merged = canon(Behavior.scd2Apply(dim, batch,
      col("user_id"), col("ts"), col("event_type"), col("event_id")))
    val rebuilt = canon(Behavior.scdType2(before.unionByName(batch),
      col("user_id"), col("ts"), col("event_type"), col("event_id")))
    assert(merged == rebuilt)
    // the boundary collapse kept key 1's open run anchored at its
    // ORIGINAL start, closing at the genuinely-new value
    assert(merged.contains(
      (1L, "b", ts("2026-01-02 00:00:00"), Some(ts("2026-01-11 00:00:00")), false)))
  }

  test("scd2Apply raises on a batch event at or before a key's high-water mark") {
    val before = Seq((1L, ts("2026-01-05 00:00:00"), "a", 1L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val late = Seq((1L, ts("2026-01-03 00:00:00"), "b", 2L)) // rewrites history
      .toDF("user_id", "ts", "event_type", "event_id")
    val dim = Behavior.scdType2(before,
      col("user_id"), col("ts"), col("event_type"), col("event_id"))
    val e = intercept[Exception] {
      Behavior.scd2Apply(dim, late,
        col("user_id"), col("ts"), col("event_type"), col("event_id")).collect()
    }
    assert(e.getMessage.contains("not beyond the open row"), e.getMessage)
  }

  test("enrichAsOf: covering interval per fact, boundary inclusive, pre-dim NULL, empty intervals skipped") {
    // dim changes for user 1: a@01-02, then two changes at the SAME
    // instant 01-05 (b then c by seq) — b's interval is empty [t,t)
    val chg = Seq(
      (1L, ts("2026-01-02 00:00:00"), "a", 1L),
      (1L, ts("2026-01-05 00:00:00"), "b", 2L),
      (1L, ts("2026-01-05 00:00:00"), "c", 3L)
    ).toDF("user_id", "ts", "tier", "event_id")
    val dim = Behavior.scdType2(chg,
      col("user_id"), col("ts"), col("tier"), col("event_id"))
    val facts = Seq(
      (10L, 1L, ts("2026-01-01 00:00:00")), // before first interval -> NULL
      (11L, 1L, ts("2026-01-02 00:00:00")), // boundary inclusive -> a
      (12L, 1L, ts("2026-01-04 00:00:00")), // inside [a, ...) -> a
      (13L, 1L, ts("2026-01-05 00:00:00")), // equal-instant pair: c holds, b's empty interval never matches
      (14L, 2L, ts("2026-01-04 00:00:00"))  // unknown key -> NULL
    ).toDF("event_id", "user_id", "ts")
    val got = Behavior.enrichAsOf(facts, dim, "user_id", "ts", attrName = "tier")
      .orderBy("event_id")
      .select("event_id", "tier").as[(Long, Option[String])].collect().toList
    assert(got == List(
      (10L, None), (11L, Some("a")), (12L, Some("a")),
      (13L, Some("c")), (14L, None)))
  }

  test("snapshotAt returns the run-start interval covering T; unborn keys absent") {
    val log = Seq(
      (1L, ts("2026-01-01 00:00:00"), "a", 1L),
      (1L, ts("2026-01-02 00:00:00"), "a", 2L), // repeat: run START stays 01-01
      (1L, ts("2026-01-05 00:00:00"), "b", 3L), // after T
      (2L, ts("2026-01-04 00:00:00"), "x", 1L), // born after T: absent
      (3L, ts("2026-01-03 00:00:00"), "c", 1L) // exactly at T: valid_from <= T
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Behavior.snapshotAt(log,
        col("user_id"), col("ts"), col("event_type"), col("event_id"),
        lit("2026-01-03 00:00:00").cast("timestamp"))
      .orderBy("key")
      .as[(Long, String, Timestamp)].collect().toSeq
    assert(got == Seq(
      (1L, "a", ts("2026-01-01 00:00:00")),
      (3L, "c", ts("2026-01-03 00:00:00"))))
  }

  test("funnel: stages must occur strictly in order; depth counts reached stages") {
    val ev = Seq(
      // full path
      (1L, ts("2026-01-01 10:00:00"), "view"),
      (1L, ts("2026-01-01 11:00:00"), "click"),
      (1L, ts("2026-01-01 12:00:00"), "purchase"),
      // click BEFORE the first view: doesn't count
      (2L, ts("2026-01-01 09:00:00"), "click"),
      (2L, ts("2026-01-01 10:00:00"), "view"),
      // no view at all: excluded
      (3L, ts("2026-01-01 10:00:00"), "click"),
      // purchase without a click: stops at depth 1
      (4L, ts("2026-01-01 10:00:00"), "view"),
      (4L, ts("2026-01-01 11:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Behavior.funnel(ev, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .orderBy("user")
      .select("user", "depth").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 1L), (4L, 1L)))
  }

  test("funnel picks the EARLIEST qualifying time per stage") {
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), "view"),
      (1L, ts("2026-01-01 10:30:00"), "click"),
      (1L, ts("2026-01-01 11:00:00"), "click") // later click ignored
    ).toDF("user_id", "ts", "event_type")
    val got = Behavior.funnel(ev, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click"))
      .select("t2").as[Timestamp].collect().head
    assert(got == ts("2026-01-01 10:30:00"))
  }

  test("lastTouchAttribution: latest touch within window wins; outside window is organic") {
    val ev = Seq(
      (1L, ts("2026-01-01 09:00:00"), "click"),
      (1L, ts("2026-01-01 10:00:00"), "click"), // latest preceding: wins
      (1L, ts("2026-01-01 11:00:00"), "purchase"),
      (2L, ts("2026-01-01 10:00:00"), "click"),
      (2L, ts("2026-01-03 10:00:00"), "purchase"), // click 2 days old: organic
      (3L, ts("2026-01-01 10:00:00"), "purchase"), // no click at all
      (4L, ts("2026-01-01 12:00:00"), "click"),
      (4L, ts("2026-01-01 11:00:00"), "purchase") // click AFTER conversion: organic
    ).toDF("user_id", "ts", "event_type")
    val got = Behavior.lastTouchAttribution(ev, col("user_id"), col("ts"),
        col("event_type"), "click", "purchase", windowSec = 86400L)
      .orderBy("user")
      .as[(Long, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, ts("2026-01-01 11:00:00"), Some(ts("2026-01-01 10:00:00")), true),
      (2L, ts("2026-01-03 10:00:00"), None, false),
      (3L, ts("2026-01-01 10:00:00"), None, false),
      (4L, ts("2026-01-01 11:00:00"), None, false)))
  }

  test("retentionCohorts: offset-0 cell equals cohort size; offsets are week-exact") {
    // 2026-01-05 and 2026-01-12 are Mondays
    val ev = Seq(
      (1L, ts("2026-01-05 10:00:00")), // u1 cohort W0
      (1L, ts("2026-01-07 10:00:00")), // same week, dedups
      (1L, ts("2026-01-14 10:00:00")), // active W1
      (2L, ts("2026-01-06 10:00:00")), // u2 cohort W0, never again
      (3L, ts("2026-01-12 10:00:00")) // u3 cohort W1
    ).toDF("user_id", "ts")
    val got = Behavior.retentionCohorts(ev, col("user_id"), col("ts"))
      .orderBy("cohort_week", "week_offset")
      .as[(Timestamp, Long, Long)].collect().toSeq
    assert(got == Seq(
      (ts("2026-01-05 00:00:00"), 0L, 2L),
      (ts("2026-01-05 00:00:00"), 1L, 1L),
      (ts("2026-01-12 00:00:00"), 0L, 1L)))
  }

  test("transitionMatrix: exact counts, ppm conditionals, tie-broken sequences") {
    val ev = Seq(
      // u1: a→b→a→c; u2: a→b; equal-time pair in u3 ordered by event_id
      ("u1", ts("2026-01-01 00:00:00"), "a", 1L),
      ("u1", ts("2026-01-01 00:01:00"), "b", 2L),
      ("u1", ts("2026-01-01 00:02:00"), "a", 3L),
      ("u1", ts("2026-01-01 00:03:00"), "c", 4L),
      ("u2", ts("2026-01-01 00:00:00"), "a", 5L),
      ("u2", ts("2026-01-01 00:01:00"), "b", 6L),
      ("u3", ts("2026-01-01 00:00:00"), "x", 8L),
      ("u3", ts("2026-01-01 00:00:00"), "y", 7L) // earlier id → y first
    ).toDF("u", "t", "et", "eid")
    val got = Behavior.transitionMatrix(ev, col("u"), col("t"), col("et"), col("eid"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // from a: a→b twice, a→c once → 666666 / 333333 ppm
    assert(got(("a", "b")) == ((2L, 666666L)))
    assert(got(("a", "c")) == ((1L, 333333L)))
    assert(got(("b", "a")) == ((1L, 1000000L)))
    assert(got(("y", "x")) == ((1L, 1000000L)), "tie must order by event_id")
    assert(!got.contains(("x", "y")))
    // last events contribute nothing: no c→ or b→ (beyond b→a) rows
    assert(got.size == 4, s"got $got")
  }

  test("conversionLatency: completed funnels only, per-day rank percentiles") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val day0 = 86400L * 20000 // a fixed positive day
    // u1 converts in 100s, u2 in 300s, u3 never purchases
    val events = Seq(
      (1L, t(day0 + 10), "view"), (1L, t(day0 + 50), "click"), (1L, t(day0 + 110), "purchase"),
      (2L, t(day0 + 20), "view"), (2L, t(day0 + 30), "click"), (2L, t(day0 + 320), "purchase"),
      (3L, t(day0 + 40), "view"), (3L, t(day0 + 60), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Behavior.conversionLatency(events,
        col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .select("day", "n_conv", "p50_sec", "p90_sec", "max_sec")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    // latencies {100, 300}: p50 = value at ceil(2*0.5)=1 -> 100,
    // p90 = value at ceil(2*0.9)=2 -> 300
    assert(got == List((20000L, 2L, 100L, 300L, 300L)), s"got $got")
  }

  test("linearAttribution: largest-remainder credits conserve exactly, direct arm fires") {
    def ev(u: Long, sec: Long, et: String, id: Long) =
      (u, new Timestamp(sec * 1000L), et, id)
    val rows = Seq(
      // purchase at t=5000 with 3 touches inside [1400, 5000): credit
      // 333334 to the most recent (view@4000), 333333 to the other two
      ev(1, 2000, "view", 10), ev(1, 3000, "click", 11), ev(1, 4000, "view", 12),
      ev(1, 5000, "purchase", 13),
      ev(1, 1000, "view", 9),      // outside the 1h window
      // untouched purchase -> __direct__
      ev(2, 9000, "purchase", 20)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Behavior.linearAttribution(rows, col("user_id"), col("ts"),
        col("event_type"), col("event_id"), "purchase", windowSec = 3600L)
      .as[(String, Long, Long)].collect()
      .map { case (k, v2, v3) => k -> ((v2, v3)) }.toMap
    assert(out("view") == ((2L, 333333L + 333334L)))
    assert(out("click") == ((1L, 333333L)))
    assert(out("__direct__") == ((1L, 1000000L)))
    // conservation: 2 purchases -> exactly 2e6 ppm
    assert(out.values.map(_._2).sum == 2000000L)
  }

  test("audienceOverlap: exact Jaccard over deduped audiences") {
    val events = Seq(
      (1L, "view"), (1L, "view"), (1L, "click"), // dup (1,view) collapses
      (2L, "view"), (2L, "buy"),
      (3L, "view"), (3L, "click"), (3L, "buy"),
      (4L, "lurk")                               // overlaps nothing
    ).toDF("user_id", "event_type")
    val out = Behavior.audienceOverlap(events, col("user_id"), col("event_type"))
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5, t._6))).toMap
    // view={1,2,3} click={1,3} buy={2,3} lurk={4}
    assert(out(("click", "view")) == ((2L, 3L, 2L, 2L * 1000000L / 3L)))
    assert(out(("buy", "view")) == ((2L, 3L, 2L, 2L * 1000000L / 3L)))
    assert(out(("buy", "click")) == ((2L, 2L, 1L, 1000000L / 3L)))
    assert(!out.keySet.exists(p => p._1 == "lurk" || p._2 == "lurk"),
      "non-overlapping audiences emit no row")
  }

  test("conversionCurve: strict day windows, never-converters in the denominator") {
    def ev(u: Long, day: Long, et: String) =
      (u, new Timestamp(day * 86400000L + 3600000L), et)
    val events = Seq(
      ev(1, 0, "view"), ev(1, 0, "purchase"),   // same day -> within 1d
      ev(2, 0, "view"), ev(2, 2, "purchase"),   // +2d -> 3d and 7d only
      ev(3, 1, "view"), ev(3, 7, "purchase"),   // +6d -> 7d only
      ev(4, 1, "view"),                           // never converts
      ev(5, 2, "view"), ev(5, 9, "purchase")    // +7d -> NOT within 7d
    ).toDF("user_id", "ts", "event_type")
    val out = Behavior.conversionCurve(events, col("user_id"), col("ts"),
        col("event_type"), "purchase")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.toList == List((0L, 5L, 1L, 2L, 3L, 3L * 1000000L / 5L)),
      s"got ${out.toList}")
  }

  test("sessionPaths: gap splits sessions, short prefixes, exact shares") {
    def ev(u: Long, sec: Long, et: String, id: Long) =
      (u, new Timestamp(sec * 1000L), et, id)
    val rows = Seq(
      // user 1, session 1: view>click>view (4th event beyond depth)
      ev(1, 0, "view", 1), ev(1, 60, "click", 2), ev(1, 120, "view", 3),
      ev(1, 180, "buy", 4),
      // user 1, session 2 after a 1-hour gap: single-event path "view"
      ev(1, 3900, "view", 5),
      // user 2: view>click
      ev(2, 0, "view", 6), ev(2, 30, "click", 7)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Behavior.sessionPaths(rows, col("user_id"), col("ts"),
        col("event_type"), col("event_id"), gapSec = 1800L, depth = 3)
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out == Map(
      "view>click>view" -> ((1L, 333333L)),
      "view" -> ((1L, 333333L)),
      "view>click" -> ((1L, 333333L))))
  }

  test("timeDecayAttribution: halving weights, largest-remainder conservation, direct arm") {
    import org.apache.spark.sql.functions.col
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // conversion at t=1000: touch A age 1 (w=1e6), B age 700 (h=1,
    // w=500000), C age 1900... wait — window is 3600 so age 1900 is in.
    val rows = Seq(
      (1L, "u1", "click", ts(999L)),   // A: h=0, w=1000000
      (2L, "u1", "view", ts(300L)),    // B: h=1, w=500000
      (3L, "u1", "signup", ts(-900L)), // C: h=3, w=125000
      (4L, "u1", "purchase", ts(1000L)),
      (5L, "u2", "purchase", ts(50L))  // touchless -> __direct__
    )
    val out = Behavior.timeDecayAttribution(
        rows.toDF("event_id", "user_id", "event_type", "ts"),
        col("user_id"), col("ts"), col("event_type"), col("event_id"),
        convType = "purchase", windowSec = 3600L, halfLifeSec = 600L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // quotas 615384/307692/76923 sum 999999; leftover 1 -> largest
    // remainder (A, r=1e6) takes it
    assert(out("click") == ((1L, 615385L)), s"${out("click")}")
    assert(out("view") == ((1L, 307692L)))
    assert(out("signup") == ((1L, 76923L)))
    assert(out("__direct__") == ((1L, 1000000L)))
    assert(out.values.map(_._2).sum == 2000000L, "2 conversions x 1e6 exactly")

    // cap: ancient touch inside a huge window decays to w = 1e6 >> 20
    val far = Behavior.timeDecayAttribution(
        Seq((1L, "u", "click", ts(0L)),
          (2L, "u", "purchase", ts(100000000L)))
          .toDF("event_id", "user_id", "event_type", "ts"),
        col("user_id"), col("ts"), col("event_type"), col("event_id"),
        convType = "purchase", windowSec = 200000000L, halfLifeSec = 600L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(far("click") == 1000000L, "sole touch still gets ALL the credit")
  }

  test("deltaAttribution: signed shares sum through opposing moves; zero-total NULLs") {
    import org.apache.spark.sql.functions.col
    // X: 50 -> 150 (+100), Y: 100 -> 60 (-40), Z: 10 -> 50 (+40); total +100
    val rows = Seq(
      ("X", false, 50L), ("X", true, 150L),
      ("Y", false, 100L), ("Y", true, 60L),
      ("Z", false, 10L), ("Z", true, 30L), ("Z", true, 20L))
    val out = Behavior.deltaAttribution(rows.toDF("seg", "b", "v"),
      col("seg"), col("b"), col("v"))
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
    assert(out.map(_._1).toSeq == Seq("X", "Y", "Z"), "largest mover first")
    val m = out.map(r => r._1 -> r).toMap
    assert(m("X") == (("X", 50L, 150L, 100L, 100L, Some(1000000L))))
    assert(m("Y") == (("Y", 100L, 60L, -40L, 100L, Some(-400000L))))
    assert(m("Z") == (("Z", 10L, 50L, 40L, 100L, Some(400000L))))
    assert(out.flatMap(_._6).sum == 1000000L, "shares reconstruct the move")

    // perfectly offsetting moves: total 0 -> decomposition undefined
    val zero = Behavior.deltaAttribution(
      Seq(("A", false, 10L), ("A", true, 20L),
        ("B", false, 20L), ("B", true, 10L)).toDF("seg", "b", "v"),
      col("seg"), col("b"), col("v")).collect()
    assert(zero.forall(_.isNullAt(5)))
  }

  test("markovAttribution: hand chain — removal effects and shares exact") {
    // u1: a -> buy; u2: a -> b -> buy; u3: b -> (no buy)
    // probs ppm: S: a 666666, b 333333; a: conv 500000, b 500000;
    // b: conv 500000, drop 500000 -> base p(S) = 666666.
    // remove a: p(S) = 166666 -> removal 500000; remove b: 333333 ->
    // removal 333333; shares 600000 / 399999 (floors)
    def t(s: Int) = new Timestamp(1704067200000L + s * 1000L)
    val rows = Seq(
      (1L, t(1), "a", 10L), (1L, t(2), "buy", 11L),
      (2L, t(1), "a", 20L), (2L, t(2), "b", 21L), (2L, t(3), "buy", 22L),
      (3L, t(1), "b", 30L))
      .toDF("u", "ts", "et", "eid")
    val got = Behavior.markovAttribution(rows, col("u"), col("ts"),
        col("et"), col("eid"), convType = "buy")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(got("a") == ((2L, 666666L, 166666L, 500000L, Some(600000L))),
      s"got $got")
    assert(got("b") == ((2L, 666666L, 333333L, 333333L, Some(399999L))),
      s"got $got")
  }

  test("markovAttribution: chain emit equals the retired 4-union transition build") {
    // the r20 single-pass claim, pinned on the REAL fixture: the sorted
    // journey array's chain emit (slot 0 / consecutive slots / last
    // slot / journeys-absent direct arm) produces EXACTLY the multiset
    // the lead/max-window union formulation did. Both formulations are
    // replicated here over the shared journey front (verbatim from
    // journeyTouches' documented dataflow) and compared as
    // (src, dst) -> n maps; the operator's OUTPUT is pinned end-to-end
    // by the hand-chain tests and the q308/q312 oracles.
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val events = graft.core.Tables.events(spark, dir)
    val convType = "purchase"
    val base = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
      .select(col("user_id").as("user"),
        unix_timestamp(col("ts")).cast("long").as("sec"),
        col("event_type").cast("string").as("et"),
        col("event_id").cast("long").as("eid"))
    val convs = base.filter(col("et") === convType)
      .groupBy("user")
      .agg(min(struct(col("sec"), col("eid"))).as("__c"))
      .select(col("user"), col("__c.sec").as("conv_sec"),
        col("__c.eid").as("conv_id"))
    val w = Window.partitionBy("user").orderBy("sec", "eid")
    val touches = base.filter(col("et") =!= convType)
      .join(convs, Seq("user"), "left")
      .filter(col("conv_sec").isNull ||
        col("sec") < col("conv_sec") ||
        (col("sec") === col("conv_sec") && col("eid") < col("conv_id")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 50)
      .withColumn("converted", col("conv_sec").isNotNull)
      .localCheckpoint(false)
    val S = "__start__"; val CONV = "__conv__"; val DROP = "__drop__"
    // OLD: 4-union windowed build
    val wcap = Window.partitionBy("user")
    val withNext = touches
      .withColumn("__next", lead(col("et"), 1)
        .over(Window.partitionBy("user").orderBy("rn")))
      .withColumn("__maxrn", max(col("rn")).over(wcap))
    val oldCounts = withNext.filter(col("rn") === 1)
      .select(lit(S).as("src"), col("et").as("dst"))
      .union(withNext.filter(col("__next").isNotNull)
        .select(col("et").as("src"), col("__next").as("dst")))
      .union(withNext.filter(col("rn") === col("__maxrn"))
        .select(col("et").as("src"),
          when(col("converted"), CONV).otherwise(DROP).as("dst")))
      .union(convs.join(touches.select("user").distinct(),
          Seq("user"), "left_anti")
        .select(lit(S).as("src"), lit(CONV).as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // NEW: journey-grain chain emit (the shipped formulation)
    val journeys = touches
      .groupBy("user")
      .agg(array_sort(collect_list(struct(col("rn"), col("et")))).as("__j"),
        max(col("converted")).as("__conv"))
    val newCounts = journeys
      .select(explode(expr(
        s"""concat(
           |  transform(__j, (x, i) ->
           |    named_struct('src', IF(i = 0, '$S', __j[i - 1].et),
           |                 'dst', x.et)),
           |  array(named_struct('src', element_at(__j, -1).et,
           |                     'dst', IF(__conv, '$CONV', '$DROP'))))"""
          .stripMargin)).as("t"))
      .select(col("t.src").as("src"), col("t.dst").as("dst"))
      .union(convs.select("user")
        .join(journeys.select("user"), Seq("user"), "left_anti")
        .select(lit(S).as("src"), lit(CONV).as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(oldCounts.nonEmpty && oldCounts.contains((S, CONV)),
      "fixture must exercise the direct-conversion arm")
    assert(newCounts == oldCounts,
      s"transition multisets diverged: old=$oldCounts new=$newCounts")
  }

  test("markovAttribution: post-conversion events ignored; direct conversions count") {
    // u1 converts FIRST then touches a (ignored -> a never in a journey);
    // u2: b -> buy. Direct S->conv arm from u1.
    def t(s: Int) = new Timestamp(1704067200000L + s * 1000L)
    val rows = Seq(
      (1L, t(1), "buy", 10L), (1L, t(2), "a", 11L),
      (2L, t(1), "b", 20L), (2L, t(2), "buy", 21L))
      .toDF("u", "ts", "et", "eid")
    val got = Behavior.markovAttribution(rows, col("u"), col("ts"),
        col("et"), col("eid"), convType = "buy")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    // S: conv 500000 (u1 direct), b 500000; b -> conv 1e6.
    // base = 1e6; remove b: 500000 -> removal 500000, all of it b's
    assert(got == Map("b" -> 500000L), s"got $got")
  }

  test("markovAttribution: no channels at all yields an empty, schema-stable frame") {
    def t(s: Int) = new Timestamp(1704067200000L + s * 1000L)
    val rows = Seq((1L, t(1), "buy", 10L)).toDF("u", "ts", "et", "eid")
    val got = Behavior.markovAttribution(rows, col("u"), col("ts"),
      col("et"), col("eid"), convType = "buy")
    assert(got.count() == 0L)
    assert(got.columns.toSeq == Seq("channel", "n_out", "base_conv_ppm",
      "removed_conv_ppm", "removal_ppm", "share_ppm"))
  }

  test("shapleyAttribution: hand coalitions — marginal credits and shares exact") {
    // u1: a -> buy ({a}: v=1e6); u2: a,b -> buy ({a,b}: v=1e6);
    // u3: b (no buy) ({b}: v=0).
    // a: from {a} (1e6-0)/1 = 1e6; from {a,b} vs {b}: (1e6-0)/2 = 5e5
    //    -> credit 1.5e6 over 2 journeys
    // b: from {a,b} vs {a}: (1e6-1e6)/2 = 0; from {b} vs {}: 0 -> 0
    // shares: a 1e6, b 0
    def t(s: Int) = new Timestamp(1704067200000L + s * 1000L)
    val rows = Seq(
      (1L, t(1), "a", 10L), (1L, t(2), "buy", 11L),
      (2L, t(1), "a", 20L), (2L, t(2), "b", 21L), (2L, t(3), "buy", 22L),
      (3L, t(1), "b", 30L))
      .toDF("u", "ts", "et", "eid")
    val got = Behavior.shapleyAttribution(rows, col("u"), col("ts"),
        col("et"), col("eid"), convType = "buy")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got("a") == ((2L, 1500000L, Some(1000000L))), s"got $got")
    assert(got("b") == ((2L, 0L, Some(0L))), s"got $got")
  }

  test("shapleyAttribution: post-conversion touches ignored; no-touch corpus is empty") {
    def t(s: Int) = new Timestamp(1704067200000L + s * 1000L)
    // u1 converts FIRST: the later 'a' touch is outside the journey ->
    // no coalition ever contains a
    val rows = Seq(
      (1L, t(1), "buy", 10L), (1L, t(2), "a", 11L),
      (2L, t(1), "b", 20L), (2L, t(2), "buy", 21L))
      .toDF("u", "ts", "et", "eid")
    val got = Behavior.shapleyAttribution(rows, col("u"), col("ts"),
        col("et"), col("eid"), convType = "buy")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("b"), s"got $got")
    val none = Behavior.shapleyAttribution(
      Seq((1L, t(1), "buy", 10L)).toDF("u", "ts", "et", "eid"),
      col("u"), col("ts"), col("et"), col("eid"), convType = "buy")
    assert(none.count() == 0L)
    assert(none.columns.toSeq ==
      Seq("channel", "n_journeys", "credit_ppm", "share_ppm"))
  }

  test("shapleyAttribution: fail-stops on '|' and on empty channel names") {
    def log(ch: String) = Seq(
      (1L, ts("2026-01-01 00:00:00"), ch, 1L),
      (1L, ts("2026-01-02 00:00:00"), "buy", 2L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    intercept[IllegalArgumentException] {
      Behavior.shapleyAttribution(log("a|b"), col("user_id"), col("ts"),
        col("event_type"), col("event_id"), convType = "buy")
    }
    intercept[IllegalArgumentException] {
      Behavior.shapleyAttribution(log(""), col("user_id"), col("ts"),
        col("event_type"), col("event_id"), convType = "buy")
    }
  }

  test("shapleyAttributionSanitized: hostile alphabet gets the clean alphabet's exact credits") {
    // channel bijection A/B/C -> '|'-name / empty / the literal escape
    // token; u2/u5 are SINGLETON-{B} journeys — the exact shape the
    // empty-name aliasing bug would zero out (parent lookup resolving
    // to v({""}) instead of v(emptyset)=0)
    def mk(a: String, b: String, c: String, conv: String) = Seq(
      (1L, ts("2026-01-01 00:00:00"), a, 1L),
      (1L, ts("2026-01-01 01:00:00"), b, 2L),
      (1L, ts("2026-01-02 00:00:00"), conv, 3L),
      (2L, ts("2026-01-01 00:00:00"), b, 4L),
      (3L, ts("2026-01-01 00:00:00"), b, 5L),
      (3L, ts("2026-01-01 02:00:00"), c, 6L),
      (3L, ts("2026-01-02 00:00:00"), conv, 7L),
      (4L, ts("2026-01-01 00:00:00"), c, 8L),
      (5L, ts("2026-01-01 00:00:00"), b, 9L),
      (5L, ts("2026-01-03 00:00:00"), conv, 10L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    val clean = rows(Behavior.shapleyAttribution(mk("A", "B", "C", "buy"),
      col("user_id"), col("ts"), col("event_type"), col("event_id"), "buy"))
    val hostile = rows(Behavior.shapleyAttributionSanitized(
      mk("a|b", "", "%E", "bu|y"),
      col("user_id"), col("ts"), col("event_type"), col("event_id"), "bu|y"))
    val names = Map("A" -> "a|b", "B" -> "", "C" -> "%E")
    assert(hostile == clean.map { case (k, v) => names(k) -> v })
    // the singleton-{B} marginal is non-zero: v({B}) = 500000 (1 of 2
    // singleton journeys converts), parent = the TRUE empty coalition
    assert(clean("B")._2 != 0L)
  }

  test("rfmSegmentsHist: bit-identical to the sort-window rfmSegments") {
    // heavy metric ties (few distinct recencies/frequencies over many
    // users) — exactly where quintile boundaries are tie-broken by user
    val log = (1 to 240).map { i =>
      (s"u${i % 80}", ts(f"2026-01-${(i % 9) + 1}%02d 00:00:00"),
        ((i * 13) % 40).toDouble / 4d)
    }.toDF("user_id", "ts", "value")
    val ref = Behavior.rfmSegments(log,
        col("user_id"), col("ts"), col("value"))
      .collect().map(_.toString).toSeq.sorted
    val got = Behavior.rfmSegmentsHist(log,
        col("user_id"), col("ts"), col("value"))
      .collect().map(_.toString).toSeq.sorted
    assert(got == ref)
    assert(ref.size == 80)
  }

  test("markovAttributionBucketed: degrades where the raw operator fail-stops") {
    // 12 distinct channels c01..c12 (cap below at topChannels+1 = 4):
    // touch volumes c01 ×3, c02 ×2, c03 ×2, the rest ×1 — top-3 is
    // {c01, c02, c03} (the c02/c03-vs-c04.. tie breaks on name)
    def t(s: Int) = new Timestamp(1704067200000L + s * 1000L)
    val rows = (
      Seq((1L, t(1), "c01", 10L), (1L, t(2), "buy", 11L),
        (2L, t(1), "c01", 20L), (2L, t(2), "c02", 21L), (2L, t(3), "buy", 22L),
        (3L, t(1), "c01", 30L), (3L, t(2), "c02", 31L), (3L, t(3), "c03", 32L),
        (4L, t(1), "c03", 40L)) ++
      (4 to 12).map(i => (10L + i, t(1), f"c$i%02d", 100L + i))
    ).toDF("u", "ts", "et", "eid")
    val raw = intercept[IllegalArgumentException] {
      Behavior.markovAttribution(rows, col("u"), col("ts"), col("et"),
        col("eid"), convType = "buy", maxChannels = 4).collect()
    }
    assert(raw.getMessage.contains("exceed maxChannels"), raw.getMessage)
    val got = Behavior.markovAttributionBucketed(rows, col("u"), col("ts"),
        col("et"), col("eid"), convType = "buy", topChannels = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("c01", "c02", "c03", "__other__"), s"got $got")
    // pre-truncation touch volumes survive as n_out sources: the 9 tail
    // touches all fold into __other__'s outgoing mass
    assert(got("__other__") == 9L, s"got $got")
    assert(got("c01") == 3L && got("c02") == 2L && got("c03") == 2L, s"got $got")
  }

  test("markovAttributionBucketed: below the cap it IS the raw operator") {
    def t(s: Int) = new Timestamp(1704067200000L + s * 1000L)
    val rows = Seq(
      (1L, t(1), "a", 10L), (1L, t(2), "buy", 11L),
      (2L, t(1), "a", 20L), (2L, t(2), "b", 21L), (2L, t(3), "buy", 22L),
      (3L, t(1), "b", 30L))
      .toDF("u", "ts", "et", "eid")
    def key(r: org.apache.spark.sql.Row) = r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val raw = Behavior.markovAttribution(rows, col("u"), col("ts"),
      col("et"), col("eid"), convType = "buy").collect().map(key).toMap
    val bucketed = Behavior.markovAttributionBucketed(rows, col("u"),
      col("ts"), col("et"), col("eid"), convType = "buy", topChannels = 10)
      .collect().map(key).toMap
    assert(bucketed == raw, s"raw $raw vs bucketed $bucketed")
    assert(!bucketed.contains("__other__"))
  }
}
