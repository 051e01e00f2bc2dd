package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def day(d: Int, perDay: Int, key: String = "a"): Seq[(String, Timestamp)] =
    (0 until perDay).map(i =>
      (key, Timestamp.valueOf(f"2024-01-${d}%02d 0${i % 9}:00:00")))

  test("rollingAnomalies: planted spike flags, steady days don't, warm-up unflagged") {
    // 10 steady days at 5 events, then a 50-event spike, then steady again
    val ev = ((1 to 10).flatMap(d => day(d, 5)) ++ day(11, 50) ++
      (12 to 14).flatMap(d => day(d, 5))).toDF("k", "ts")
    val got = TimeSeries.rollingAnomalies(ev, col("k"), col("ts"))
      .orderBy("day_sec")
      .select("n_events", "is_anomaly").as[(Long, Boolean)].collect().toList
    assert(got.map(_._1) == List(5L, 5L, 5L, 5L, 5L, 5L, 5L, 5L, 5L, 5L, 50L, 5L, 5L, 5L))
    // warm-up: days 1-3 have < minPrior trailing days
    assert(got.take(3).forall(!_._2), "warm-up days never flag")
    // steady zero-variance days equal their window: not anomalous
    assert(got.slice(3, 10).forall(!_._2), "steady days never flag")
    // the spike deviates from a zero-variance window: flagged
    assert(got(10)._2, "the 10x spike must flag")
    // the day AFTER the spike: window now contains the spike, variance
    // is huge, 5 is within 3 sigma of the contaminated window
    assert(!got(11)._2, "post-spike steady day is within the inflated sigma")
  }

  test("rollingAnomalies: keys are independent; gap days count as zero") {
    val ev = (day(1, 5) ++ day(2, 5) ++ day(3, 5) ++ day(4, 5) ++
      // key b: one event on day 1 and day 5 -> days 2-4 are zero-filled
      day(1, 1, "b") ++ day(5, 1, "b")).toDF("k", "ts")
    val got = TimeSeries.rollingAnomalies(ev, col("k"), col("ts"))
      .filter(col("key") === "b")
      .orderBy("day_sec")
      .select("n_events").as[Long].collect().toList
    assert(got == List(1L, 0L, 0L, 0L, 1L), "gap days zero-fill before the window pass")
  }

  test("rollingActiveUsers: exact DAU + trailing-window WAU on a hand-built grid") {
    // users as keys: u1 active days 1,2,10; u2 active day 2 (twice —
    // dedups to one cell); u3 active day 10
    val ev = (day(1, 1, "u1") ++ day(2, 1, "u1") ++ day(10, 1, "u1") ++
      day(2, 2, "u2") ++ day(10, 1, "u3")).toDF("user", "ts")
    val got = TimeSeries.rollingActiveUsers(ev, col("user"), col("ts"), window = 7)
      .orderBy("day_sec")
      .select("dau", "wau").as[(Long, Long)].collect().toList
    // day 1: dau {u1}; wau(trailing 7) {u1}
    // day 2: dau {u1,u2}; wau {u1,u2}
    // day 10: dau {u1,u3}; wau days 4-10 -> {u1,u3} (day-2 activity aged out)
    assert(got == List((1L, 1L), (2L, 2L), (2L, 2L)))
    // only observed days appear (3 rows, not a 10-day spine)
    assert(got.size == 3)
  }

  test("rollingActiveUsers window=1 degenerates to DAU") {
    val ev = (day(1, 3, "u1") ++ day(2, 1, "u2")).toDF("user", "ts")
    val got = TimeSeries.rollingActiveUsers(ev, col("user"), col("ts"), window = 1)
      .orderBy("day_sec").select("dau", "wau").as[(Long, Long)].collect().toList
    assert(got == List((1L, 1L), (1L, 1L)))
  }

  test("intervalUnion: overlap/nesting/adjacency merge; disjoint split; exact lengths") {
    val iv = Seq(
      // u1: [0,10) ∪ [5,20) ∪ [20,25) merge to [0,25); [40,50) separate
      ("u1", 0L, 10L), ("u1", 5L, 20L), ("u1", 20L, 25L), ("u1", 40L, 50L),
      // u2: nested [0,100) ⊃ [10,20) → one island of 100
      ("u2", 0L, 100L), ("u2", 10L, 20L),
      // u3: empty and inverted intervals are dropped, not island-stitchers
      ("u3", 5L, 5L), ("u3", 9L, 3L), ("u3", 7L, 8L)
    ).toDF("k", "s", "e")
    val got = TimeSeries.intervalUnion(iv, col("k"), col("s"), col("e"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("u1") == ((2L, 35L)), s"got ${got("u1")}")
    assert(got("u2") == ((1L, 100L)))
    assert(got("u3") == ((1L, 1L)), "only the valid [7,8) survives")
  }

  test("timeWeightedAvg: holding-time weights, tie-broken segments, zero-span excluded") {
    val obs = Seq(
      // u1: v=10 held 0→10 (weight 10), v=40 held 10→20 (weight 10)
      // → twa = (100+400)/20 = 25; last obs at t=20 carries no weight
      ("u1", 0L, 10L, 1L), ("u1", 10L, 40L, 2L), ("u1", 20L, 999L, 3L),
      // u2: equal timestamps tie-broken by ord — the t=5 pair contributes
      // a zero-length segment for ord=1, then v=30 spans 5→15
      ("u2", 5L, 7L, 1L), ("u2", 5L, 30L, 2L), ("u2", 15L, 0L, 3L),
      // u3: single observation → zero span → excluded
      ("u3", 42L, 5L, 1L)
    ).toDF("k", "t", "v", "o")
    val got = TimeSeries.timeWeightedAvg(obs, col("k"), col("t"), col("v"), col("o"))
      .select("key", "n_obs", "span", "twa")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("u1") == (("u1", 3L, 20L, 25L)), s"got ${got("u1")}")
    assert(got("u2") == (("u2", 3L, 10L, 30L)), s"got ${got("u2")}")
    assert(!got.contains("u3"))
  }

  test("timeWeightedAvg: negative sums floor like every engine's // would") {
    val obs = Seq(("k", 0L, -7L, 1L), ("k", 3L, 0L, 2L)).toDF("k", "t", "v", "o")
    val got = TimeSeries.timeWeightedAvg(obs, col("k"), col("t"), col("v"), col("o"))
      .select("twa").as[Long].head()
    // -21 / 3 = -7 exactly; and a non-divisible case:
    assert(got == -7L)
    val obs2 = Seq(("k", 0L, -7L, 1L), ("k", 2L, 0L, 2L), ("k", 3L, 0L, 3L))
      .toDF("k", "t", "v", "o")
    val got2 = TimeSeries.timeWeightedAvg(obs2, col("k"), col("t"), col("v"), col("o"))
      .select("twa").as[Long].head()
    assert(got2 == -5L, s"floor(-14/3) = -5, got $got2") // not trunc(-4)
  }

  test("ewmaTrailing: exact α=1/2 smoothing, head renormalization, floor on negatives") {
    // u: values 10, 20, 40 at t=0,1,2 —
    //   t=0: only the current tap exists -> ewma = 10
    //   t=1: (128*20 + 64*10) / 192 = 3200/192 = 16.666 -> 16
    //   t=2: (128*40 + 64*20 + 32*10) / 224 = 6720/224 = 30
    val obs = Seq(("u", 0L, 10L, 1L), ("u", 1L, 20L, 2L), ("u", 2L, 40L, 3L))
      .toDF("k", "t", "v", "o")
    val got = TimeSeries.ewmaTrailing(obs, col("k"), col("t"), col("v"), col("o"))
      .select("t", "ewma").as[(Long, Long)].collect().sortBy(_._1).toList
    assert(got == List((0L, 10L), (1L, 16L), (2L, 30L)), s"got $got")

    // negative numerator floors (portable // semantics), never truncates
    val neg = Seq(("u", 0L, -10L, 1L), ("u", 1L, 3L, 2L)).toDF("k", "t", "v", "o")
    val gotNeg = TimeSeries.ewmaTrailing(neg, col("k"), col("t"), col("v"), col("o"))
      .select("t", "ewma").as[(Long, Long)].collect().sortBy(_._1).toList
    // t=1: (128*3 - 64*10)/192 = -256/192 = -1.33 -> floor -2 (not trunc -1)
    assert(gotNeg == List((0L, -10L), (1L, -2L)), s"got $gotNeg")

    // beyond the horizon the 9th-oldest value stops contributing
    val long = (0 to 8).map(i => ("u", i.toLong, if (i == 0) 1000000L else 0L, i.toLong))
      .toDF("k", "t", "v", "o")
    val tail = TimeSeries.ewmaTrailing(long, col("k"), col("t"), col("v"), col("o"))
      .filter(col("t") === 8L).select("ewma").as[Long].head()
    assert(tail == 0L, s"t=8 must not see t=0's spike, got $tail")
  }

  test("interArrivalStats: gap percentiles per key; single-event keys emit nothing") {
    val rows = Seq(
      // k: events at 0,10,30,100 -> gaps {10,20,70}; p50=rank2=20, p90=rank3=70
      ("k", 0L, 1L), ("k", 10L, 2L), ("k", 30L, 3L), ("k", 100L, 4L),
      ("solo", 5L, 9L))
      .toDF("key", "t", "o")
    val got = TimeSeries.interArrivalStats(rows, col("key"), col("t"), col("o"))
      .select("key", "n_gaps", "p50_gap_sec", "p90_gap_sec", "max_gap_sec")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("k") == (("k", 3L, 20L, 70L, 70L)), s"got ${got("k")}")
    assert(!got.contains("solo"))
  }

  test("peakRate: trailing RANGE window counts bursts, not means") {
    // u1: burst of 3 within 60s at t=100..159, then singles far apart
    val rows = Seq(("u1", 100L), ("u1", 130L), ("u1", 159L), ("u1", 500L),
      ("u2", 0L), ("u2", 59L), ("u2", 60L)) // [1,60] holds 59&60 plus... t=0 exits at t=60
      .toDF("k", "t")
    val got = TimeSeries.peakRate(rows, col("k"), col("t"), windowSec = 60L)
      .select("key", "n_events", "peak")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("u1") == (("u1", 4L, 3L)), s"got ${got("u1")}")
    // u2 at t=60: frame [1, 60] -> {59, 60} = 2; at t=59: [0,59] -> {0,59} = 2
    assert(got("u2") == (("u2", 3L, 2L)), s"got ${got("u2")}")
  }

  test("intervalUnion: a zero-length interval between islands does not merge them") {
    // [0,5) and [5,5) and [6,10): the empty interval at 5 is dropped;
    // [0,5) and [6,10) stay two islands (gap at [5,6))
    val iv = Seq(("k", 0L, 5L), ("k", 5L, 5L), ("k", 6L, 10L)).toDF("k", "s", "e")
    val got = TimeSeries.intervalUnion(iv, col("k"), col("s"), col("e"))
      .as[(String, Long, Long)].collect().head
    assert(got == (("k", 2L, 9L)))
  }

  test("trendSlopes: exact rational OLS, negative slope preserved, single day undefined") {
    def t(day: Int, n: Int, key: String) =
      (0 until n).map(_ => (key, Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")))
    // up: counts 1,2,3 over days 0,1,2 -> slope exactly +1 (num 6, den 6)
    // down: counts 5,3,1             -> slope exactly -2 (num -12, den 6)
    // flat1: one day only            -> undefined (0, 0)
    val rows = t(1, 1, "up") ++ t(2, 2, "up") ++ t(3, 3, "up") ++
      t(1, 5, "down") ++ t(2, 3, "down") ++ t(3, 1, "down") ++
      t(1, 4, "flat1")
    val got = TimeSeries.trendSlopes(rows.toDF("k", "ts"), col("k"), col("ts"))
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("up") == (("up", 3L, 6L, 6L, 6L)), s"${got("up")}")
    assert(got("down") == (("down", 3L, 9L, -12L, 6L)), s"${got("down")}")
    assert(got("flat1") == (("flat1", 1L, 4L, 0L, 0L)), s"${got("flat1")}")
  }

  test("cusumAt: fixed-target closed form equals the recursion in value units") {
    val xs = Seq(5L, 50L, 50L, 5L, 5L, 60L)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      ("k", Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"), x.toDouble, i.toLong)
    }
    val got = TimeSeries.cusumAt(rows.toDF("k", "ts", "v", "id"),
        col("k"), col("ts"), col("v"), col("id"),
        target = 10L, slack = 5L, threshold = 40L)
      .orderBy("seq")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toList
    val ref = xs.scanLeft(0L)((s, x) => math.max(0L, s + (x - 10L - 5L))).tail
    assert(got.map(_._5) == ref, s"${got.map(_._5)} vs $ref")
    assert(got.map(_._6) == ref.map(_ > 40L))
  }

  test("cusumDrift: closed form equals the clamped recursion; NULLs excluded") {
    // series with a level shift: 10,10,10 then 30,30,30 (mean 20)
    val xs = Seq(10L, 10L, 10L, 30L, 30L, 30L)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (Some("k"), Some(Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d")),
        Some(x.toDouble), i.toLong)
    } ++ Seq((None, Some(Timestamp.valueOf("2024-01-01 00:01:00")), Some(1.0), 99L),
      (Some("k"), None, Some(1.0), 98L),
      (Some("k"), Some(Timestamp.valueOf("2024-01-01 00:01:01")), None, 97L))
    val got = TimeSeries.cusumDrift(rows.toDF("k", "ts", "v", "id"),
        col("k"), col("ts"), col("v"), col("id"), slack = 2L, threshold = 6L)
      .orderBy("seq")
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect().toList

    // reference: the textbook recursion s_i = max(0, s_prev + (x - mu - k)),
    // run in n-scaled integers exactly like the operator's contract
    val n = xs.length.toLong
    val sx = xs.sum
    val ref = xs.scanLeft(0L) { (s, x) =>
      math.max(0L, s + (n * x - sx - 2L * n))
    }.tail
    assert(got.map(_._5) == ref, s"closed form ${got.map(_._5)} vs recursion $ref")
    // mean 20, slack 2: the 30s drift at +8/step (x48 n-scaled) -> alarm
    // once cusum_nx > 6*n = 36
    assert(got.map(_._7) == List(false, false, false, true, true, true))
    assert(got.size == 6, "NULL key/ts/value rows are excluded")
  }

  test("theilSenSlope: median pairwise slope matches brute force and resists an outlier day") {
    // daily counts: day0->2, day1->3, day2->4, day3->100 (outlier), day4->6
    // perfect +1/day trend except day3; Theil-Sen median stays near 1e6 ppm
    val counts = Map(0 -> 2, 1 -> 3, 2 -> 4, 3 -> 100, 4 -> 6)
    val rows = counts.toSeq.flatMap { case (d, n) =>
      (1 to n).map(_ => ("a", new Timestamp(d * 86400000L + 1000L)))
    }
    val out = TimeSeries.theilSenSlope(rows.toDF("k", "ts"), col("k"), col("ts"))
      .as[(String, Long, Long)].collect().head

    val days = counts.keys.toSeq.sorted
    val slopes = for {
      i <- days; j <- days if j > i
      num = (counts(j) - counts(i)).toLong * 1000000L
      den = (j - i).toLong
    } yield (Math.floorDiv(num, den), i, j)
    val sorted = slopes.sortBy(t => (t._1, t._2, t._3))
    val expectMedian = sorted((sorted.size + 1) / 2 - 1)._1
    assert(out == (("a", slopes.size.toLong, expectMedian)))
    assert(out._3 == 1000000L, s"outlier day dragged the median: ${out._3}")

    // a single observed day yields no pair -> key excluded
    val single = TimeSeries.theilSenSlope(
      Seq(("b", new Timestamp(0L))).toDF("k", "ts"), col("k"), col("ts"))
    assert(single.count() == 0)
  }

  test("changepoint finds the planted level shift; matches brute-force gain argmax") {
    // level 2/day for days 0..4, then 10/day for days 5..9: split after day 4
    val counts = (0 to 4).map(d => d -> 2) ++ (5 to 9).map(d => d -> 10)
    val rows = counts.flatMap { case (d, n) =>
      (1 to n).map(_ => ("a", new Timestamp(d * 86400000L + 1000L)))
    }
    val out = TimeSeries.changepoint(rows.toDF("k", "ts"), col("k"), col("ts"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert((out._2, out._3, out._4, out._5, out._6) == ((10L, 4L, 5L, 10L, 50L)),
      s"got $out")

    // brute-force the floored micro-gain argmax
    val ys = counts.map(_._2.toLong)
    val n = ys.size.toLong
    val tot = ys.sum
    val gains = ys.inits.toSeq.reverse.tail.zipWithIndex.collect {
      // prefix at index i holds the first i+1 values -> split t = i+1 < n
      case (prefix, i) if i + 1 < n =>
        val t = (i + 1).toLong; val st = prefix.sum
        val a = BigInt(st * n - tot * t)
        (a * a * 1000000 / (t * (n - t) * n), t)
    }
    val best = gains.maxBy { case (g, t) => (g, -t) }
    assert(out._7 == best._1.toLong && out._4 == best._2)

    // single-day keys have no candidate split -> excluded
    val single = TimeSeries.changepoint(
      Seq(("b", new Timestamp(0L))).toDF("k", "ts"), col("k"), col("ts"))
    assert(single.count() == 0)
  }

  test("rollingOriginFolds: expanding windows anchored on max day, no leakage") {
    // one event per day for days 0..27 -> dmax=27
    val rows = (0 to 27).map(d => Tuple1(new Timestamp(d * 86400000L + 1000L)))
    val out = TimeSeries.rollingOriginFolds(rows.toDF("ts"), col("ts"),
        k = 2, horizonDays = 7)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    // fold1: test [14,20], train days < 14; fold2: test [21,27], train < 21
    assert(out == List((1L, 13L, 14L, 7L), (2L, 20L, 21L, 7L)))
  }

  test("streamHygiene: adjacent inversions, duplicate instants, max gap") {
    def ev(u: Long, ms: Long, id: Long) = (u, new Timestamp(ms), id)
    val rows = Seq(
      ev(1, 1000, 5), ev(1, 2000, 3),  // seq went backwards -> 1 ooo
      ev(1, 2000, 4),                   // duplicate instant (and seq rises)
      ev(1, 62000, 9),                  // 60s gap
      ev(2, 1000, 1)                    // single event: NULL gap
    ).toDF("user_id", "ts", "event_id")
    val out = TimeSeries.streamHygiene(rows, col("user_id"), col("ts"),
        col("event_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out(1L) == ((4L, 1L, 1L, 60L)))
    assert(out(2L) == ((1L, 0L, 0L, -1L)))
  }

  test("weekdaysBetween: closed form matches java.time brute force over 3 years") {
    import java.time.{DayOfWeek, LocalDate}
    val pairs = Seq((0L, 0L), (0L, 1L), (0L, 7L), (3L, 10L), (19723L, 19752L),
      (19000L, 20000L), (2L, 4L), (1L, 2L))
    val df = pairs.toDF("a", "b")
      .withColumn("bd", TimeSeries.weekdaysBetween(col("a"), col("b")))
    val got = df.as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    def brute(a: Long, b: Long): Long = (a until b).count { d =>
      val dow = LocalDate.ofEpochDay(d).getDayOfWeek
      dow != DayOfWeek.SATURDAY && dow != DayOfWeek.SUNDAY
    }
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == brute(a, b), s"[$a,$b): ${got((a, b))} vs ${brute(a, b)}")
    }
  }

  test("conformalInterval: rank-selected width, coverage counts misses, k>n NULLs") {
    def mk(key: String, counts: Map[Int, Int]): Seq[(String, Timestamp)] =
      counts.toSeq.flatMap { case (d, n) =>
        (1 to n).map(_ => (key, new Timestamp(d * 86400000L + 1000L)))
      }
    // key a: c(d) = d/7 + 1 over days 0..27, EXCEPT day 22 missing and
    // day 25 has +2. Calib (days 7..20): every |c(d)-c(d-7)| = 1 ->
    // width = 1. Test (21..27): days 22 (|0-3|=3) and 25 (|6-3|=3) miss.
    val ca = (0 to 27).filter(_ != 22)
      .map(d => d -> (d / 7 + 1 + (if (d == 25) 2 else 0))).toMap
    // key b: flat 2/day -> width 0, everything covered
    val cb = (0 to 27).map(d => d -> 2).toMap
    val out = TimeSeries.conformalInterval(
        (mk("a", ca) ++ mk("b", cb)).toDF("k", "ts"),
        col("k"), col("ts"),
        horizonDays = 7, seasonDays = 7, calibDays = 14)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    assert(out("a") == ((14L, 1L, 7L, 5L, 5000000L / 7L)), s"${out("a")}")
    assert(out("b") == ((14L, 0L, 7L, 7L, 1000000L)))

    // k = ceil(5 * 0.9) = 5 > calibDays=4 -> infinite interval -> NULLs
    val tight = TimeSeries.conformalInterval(mk("a", ca).toDF("k", "ts"),
        col("k"), col("ts"),
        horizonDays = 7, seasonDays = 7, calibDays = 4)
      .collect().head
    assert(tight.isNullAt(2) && tight.isNullAt(4) && tight.isNullAt(5))
  }

  test("interventionImpact: planted spike clears the zero band, flat key does not") {
    def mk(key: String, counts: Map[Int, Int]): Seq[(String, Timestamp)] =
      counts.toSeq.flatMap { case (d, n) =>
        (1 to n).map(_ => (key, new Timestamp(d * 86400000L + 1000L)))
      }
    // key a: flat 2/day, except post-window day 24 spikes to 10 and
    // day 26 is missing. Calib residuals all 0 -> width 0, band 0.
    // post: actual 2*7 - 2 + 8 = 20, forecast 14, effect +6 -> significant
    val ca = (0 to 27).filter(_ != 26)
      .map(d => d -> (if (d == 24) 10 else 2)).toMap
    // key b: perfectly flat -> width 0, effect 0 -> NOT significant
    val cb = (0 to 27).map(d => d -> 3).toMap
    val out = TimeSeries.interventionImpact(
        (mk("a", ca) ++ mk("b", cb)).toDF("k", "ts"),
        col("k"), col("ts"),
        postDays = 7, seasonDays = 7, calibDays = 14)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(t => t._1 -> t).toMap
    assert(out("a") == (("a", 7L, 20L, 14L, 6L, 0L, 0L,
      6L * 1000000L / 14L, true)), s"${out("a")}")
    assert(out("b") == (("b", 7L, 21L, 21L, 0L, 0L, 0L, 0L, false)))

    // postDays > seasonDays would let counterfactual lags leak into the
    // post window — the operator must refuse
    intercept[IllegalArgumentException] {
      TimeSeries.interventionImpact(mk("a", ca).toDF("k", "ts"),
        col("k"), col("ts"), postDays = 8, seasonDays = 7, calibDays = 14)
    }
  }

  test("holtForecast: exact milli recurrence mirror, gap days are zeros, linear horizon") {
    def mk(key: String, counts: Seq[(Long, Int)]): Seq[(String, Timestamp)] =
      counts.flatMap { case (d, n) =>
        (1 to n).map(_ => (key, new Timestamp(d * 86400000L + 1000L)))
      }
    // key a: clean linear growth; key g: day 1 missing (zero observation)
    val ca = Seq(0L -> 2, 1L -> 4, 2L -> 6, 3L -> 8, 4L -> 10)
    val cg = Seq(0L -> 3, 2L -> 3)
    def mirror(ys: Seq[Long]): (Long, Long, Long) = {
      var l = ys.head * 1000L; var b = 0L; var sae = 0L
      ys.tail.foreach { y =>
        val lNew = (300000L * y * 1000L + 700000L * (l + b)) / 1000000L
        val bNew = (100000L * (lNew - l) + 900000L * b) / 1000000L
        sae += math.abs(y * 1000L - (l + b))
        l = lNew; b = bNew
      }
      (l, b, sae)
    }
    val (la, ba, sa) = mirror(Seq(2L, 4L, 6L, 8L, 10L))
    val (lg, bg, sg) = mirror(Seq(3L, 0L, 3L))
    val out = TimeSeries.holtForecast(
        (mk("a", ca) ++ mk("g", cg)).toDF("k", "ts"),
        col("k"), col("ts"), horizonDays = 3)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    (1L to 3L).foreach { h =>
      assert(out(("a", h)) == (("a", h, 5L, la, ba, sa, la + h * ba)),
        s"a/h$h: ${out(("a", h))} vs ($la,$ba,$sa)")
      assert(out(("g", h)) == (("g", h, 3L, lg, bg, sg, lg + h * bg)))
    }
    // growth series must learn a positive trend; its forecast rises
    assert(ba > 0L && out(("a", 3L))._7 > out(("a", 1L))._7)
  }

  test("seasonalNaiveBacktest: lag-7 prediction, missing days are zero observations") {
    // key a: days 0..6 have 2/day, days 7..13 have 5/day except day 10 missing
    val days = (0 to 13).filter(_ != 10).map(d => d -> (if (d < 7) 2 else 5))
    val rows = days.flatMap { case (d, n) =>
      (1 to n).map(_ => ("a", new Timestamp(d * 86400000L + 1000L)))
    }
    val out = TimeSeries.seasonalNaiveBacktest(rows.toDF("k", "ts"),
        col("k"), col("ts"), horizonDays = 7, seasonDays = 7)
      .as[(String, Long, Long, Long)].collect().head
    // scored days 7..13: |5-2|x6 for present days, day 10: |0-2| = 2 -> 20
    assert(out == (("a", 7L, 20L, 20L * 1000000L / 7L)))
  }

  /** n events on day d (epoch-based, TZ-proof). */
  private def onDay(d: Int, n: Int, key: String = "a"): Seq[(String, Timestamp)] =
    (1 to n).map(_ => (key, new Timestamp(d * 86400000L + 1000L)))

  test("acfPpm: hand case, truncating ppm; constant series reports NULL") {
    // counts [2, 1]: n=2, S=3, centered c = [1, -1]; den = 2;
    // lag-1 num = -1 -> (-1e6) DIV 2 = -500000 (truncation toward zero)
    val rows = onDay(0, 2) ++ onDay(1, 1) ++
      (onDay(0, 3, "flat") ++ onDay(1, 3, "flat") ++ onDay(2, 3, "flat"))
    val got = TimeSeries.acfPpm(rows.toDF("k", "ts"), col("k"), col("ts"),
        maxLag = 7)
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap
    // key "a": only lag 1 emitted (lags >= n_days dropped)
    assert(got == Map(
      ("a", 1) -> ((2L, Some(-500000L))),
      ("flat", 1) -> ((3L, None)),
      ("flat", 2) -> ((3L, None))), s"got $got")
  }

  test("acfPpm: a period-2 series autocorrelates negative at lag 1, positive at lag 2") {
    val counts = Seq(5, 1, 5, 1, 5, 1, 5, 1)
    val rows = counts.zipWithIndex.flatMap { case (n, d) => onDay(d, n) }
    val got = TimeSeries.acfPpm(rows.toDF("k", "ts"), col("k"), col("ts"),
        maxLag = 2)
      .collect().map(r => r.getInt(1) -> r.getLong(3)).toMap
    // exact: c = 8y-24 over [5,1,...]: den=2048, num_1=-1792, num_2=1536
    assert(got == Map(1 -> -875000L, 2 -> 750000L), s"got $got")
  }

  test("holtWintersForecast: hand-stepped m=2 recurrence, forecast adds the right slot") {
    // series [3,1,4,1,5]: l0 = 2000, s = [1000, -1000];
    // t=3: l=2300 b=30 s0=1140 sae=1000
    // t=4: l=2231 b=20 s1=-1046 sae=1330
    // t=5: l=2733 b=68 s0=1365 sae=2939
    // forecast time t=n+h, slot (t-1)%2: h=1 -> slot 1: 2733+68-1046 = 1755;
    // h=2 -> slot 0: 2733+136+1365 = 4234
    val rows = Seq(3, 1, 4, 1, 5).zipWithIndex.flatMap { case (n, d) => onDay(d, n) }
    val got = TimeSeries.holtWintersForecast(rows.toDF("k", "ts"),
        col("k"), col("ts"), m = 2, horizon = 2)
      .as[(String, Int, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._2).toSeq
    assert(got == Seq(
      ("a", 1, 5L, 2733L, 68L, -1046L, 2939L, 1755L),
      ("a", 2, 5L, 2733L, 68L, 1365L, 2939L, 4234L)), s"got $got")
  }

  test("holtWintersForecast: keys shorter than one season are dropped") {
    val rows = onDay(0, 3) ++ onDay(1, 2) // 2 days < m+1 at m=7
    assert(TimeSeries.holtWintersForecast(rows.toDF("k", "ts"),
      col("k"), col("ts")).count() == 0L)
  }

  test("crostonForecast: first demand initializes, later demands fold size and interval") {
    // days 10..15 -> [2,0,0,3,0,1]:
    // y=2: z=2000 p=1000 nd=1; gaps 2,3; y=3: z=2200 p=1400 nd=2;
    // gap 2; y=1: z=1960 p=1520 nd=3; forecast = 1960000 DIV 1520 = 1289
    val rows = onDay(10, 2) ++ onDay(13, 3) ++ onDay(15, 1)
    val got = TimeSeries.crostonForecast(rows.toDF("k", "ts"),
        col("k"), col("ts"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 6L, 3L, 1960L, 1520L, 1289L)), s"got $got")
  }

  test("seasonalStrength: pure-seasonal and pure-trend keys land where they should") {
    // key a = the q306 fixture [1,5,3,7,5,9] (m=3): full-window rows
    // i=2..5 have residuals [2000,0,0,-2000] (vr=3.2e7), detrended
    // [2000,-2000,2000,-2000] (vdt=6.4e7), deseasoned all 5000 (vds=0):
    // strength_seasonal = 1e6 - 3.2e7*1e6 DIV 6.4e7 = 500000;
    // strength_trend NULL (flat deseasoned series - undefined, not 0)
    val a = Seq(1, 5, 3, 7, 5, 9).zipWithIndex.flatMap { case (n, d) =>
      onDay(d, n) }
    // key b = pure trend [1,2,3,4,5,6]: residuals all 0, detrended all
    // 0 (vdt=0 -> seasonal NULL), deseasoned = the trend itself
    // (vds=2e7 > 0) -> strength_trend = 1e6 exactly
    val b = Seq(1, 2, 3, 4, 5, 6).zipWithIndex.flatMap { case (n, d) =>
      onDay(d, n, "b") }
    val got = TimeSeries.seasonalStrength((a ++ b).toDF("k", "ts"),
        col("k"), col("ts"), m = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got("a") == ((4L, None, Some(500000L))), s"got $got")
    assert(got("b") == ((4L, Some(1000000L), None)), s"got $got")
  }

  test("runsTest: hand case — runs, cleared z2; degenerate keys report NULL") {
    // counts [1,5,2,6,3,7]: lower median 3; signs (3 dropped)
    // -,+,-,+,+ -> runs 4, n_above 3, n_below 2; N=5 A=12
    // d = 4*5-5-12 = 3 -> z2 = (1000*9*4) DIV 84 = 428, not significant
    val rows = Seq(1, 5, 2, 6, 3, 7).zipWithIndex.flatMap { case (n, d) =>
      onDay(d, n) }
    // constant series: every day equals the median -> all dropped
    val flat = Seq(2, 2, 2).zipWithIndex.flatMap { case (n, d) =>
      onDay(d, n, "flat") }
    val got = TimeSeries.runsTest((rows ++ flat).toDF("k", "ts"),
        col("k"), col("ts"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          r.getBoolean(6)))).toMap
    assert(got("a") == ((6L, 3L, 2L, 4L, Some(428L), false)), s"got $got")
    assert(got("flat") == ((3L, 0L, 0L, 0L, None, false)), s"got $got")
  }

  test("runsTest: a long clustered split clears significance with NEGATIVE sign") {
    // 8 low days, one median day (dropped), 8 high days: lower median
    // of the 17 counts is the middle 5, so signs are -x8 then +x8 ->
    // runs = 2 (maximal clustering). n1 = n2 = 8, N = 16, A = 128,
    // d = 2*16 - 16 - 128 = -112:
    // z2 = -(1000*12544*15) DIV (128*112) = -13125;
    // cleared: 10000*12544*15 = 1.88e9 > 38416*14336 = 5.5e8 -> true
    val rows = (Seq.fill(8)(1) ++ Seq(5) ++ Seq.fill(8)(9)).zipWithIndex
      .flatMap { case (n, d) => onDay(d, n) }
    val r = TimeSeries.runsTest(rows.toDF("k", "ts"), col("k"), col("ts"))
      .collect().head
    assert(r.getLong(4) == 2L && r.getLong(5) == -13125L && r.getBoolean(6),
      s"got $r")
  }

  test("mannKendall: monotone trend vs constant series (NULL z2, never-NULL significant)") {
    // increasing [1,2,3,4]: S=6, no ties, var18 = 4*3*13 = 156,
    // z2 = (18000*25) DIV 156 = 2884; cleared test: 4.5e6 > 5.99e6 false
    val up = Seq(1, 2, 3, 4).zipWithIndex.flatMap { case (n, d) => onDay(d, n) }
    val flat = Seq(2, 2, 2, 2).zipWithIndex.flatMap { case (n, d) =>
      onDay(d, n, "flat") }
    val got = TimeSeries.mannKendall((up ++ flat).toDF("k", "ts"),
        col("k"), col("ts"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5)))).toMap
    assert(got("a") == ((4L, 6L, 156L, Some(2884L), false)), s"got $got")
    // constant: S=0, tie term 4*3*13 = 156 -> var18 = 0 -> undefined z2
    assert(got("flat") == ((4L, 0L, 0L, None, false)), s"got $got")
  }

  test("seasonalDecompose: hand m=3 case — trend floors, slot means, NULL edges") {
    // series [1,5,3,7,5,9]: trends 3000/5000/5000/7000 at i=2..5,
    // detrended 2000/-2000/2000/-2000 at slots 1/2/0/1 -> seasonal
    // s0=2000, s1=0, s2=-2000; residuals 2000/0/0/-2000
    val rows = Seq(1, 5, 3, 7, 5, 9).zipWithIndex.flatMap { case (n, d) =>
      onDay(d, n) }
    val got = TimeSeries.seasonalDecompose(rows.toDF("k", "ts"),
        col("k"), col("ts"), m = 3)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))).toMap
    assert(got(1L) == ((0L, 1L, None, Some(2000L), None)), s"got $got")
    assert(got(2L) == ((1L, 5L, Some(3000L), Some(0L), Some(2000L))))
    assert(got(3L) == ((2L, 3L, Some(5000L), Some(-2000L), Some(0L))))
    assert(got(4L) == ((0L, 7L, Some(5000L), Some(2000L), Some(0L))))
    assert(got(5L) == ((1L, 5L, Some(7000L), Some(0L), Some(-2000L))))
    assert(got(6L) == ((2L, 9L, None, Some(-2000L), None)))
  }

  test("crossCorrPpm: a one-day-shifted copy correlates perfectly at exactly lag +1") {
    val base = Seq(1, 2, 3, 9, 3, 2)
    val rows = base.zipWithIndex.flatMap { case (n, d) => onDay(d, n, "a") } ++
      base.zipWithIndex.flatMap { case (n, d) => onDay(d + 1, n, "b") }
    val got = TimeSeries.crossCorrPpm(rows.toDF("k", "ts"),
        col("k"), col("ts"), maxLag = 2)
      .collect().map(r => r.getLong(2) ->
        ((r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap
    assert(got(1L) == ((6L, Some(1000000L))), s"got $got")
    // other lags are weaker; overlap = span intersection (a: 0-5, b: 1-6)
    assert(got(0L)._1 == 5L && got(0L)._2.get < 1000000L, s"got $got")
    assert(got(2L)._1 == 5L && got(-2L)._1 == 3L, s"got $got")
  }

  test("decayedPopularity: bit-shift halvings off the corpus max day") {
    // anchor = day 10. key a ages [10,10,1,0] -> halvings [1,1,0,0]
    // -> 500000+500000+1e6+1e6 = 3e6; key b age 7 -> one halving
    val rows = onDay(0, 2) ++ onDay(9, 1) ++ onDay(10, 1) ++
      onDay(3, 1, "b")
    val m = TimeSeries.decayedPopularity(rows.toDF("k", "ts"),
        col("k"), col("ts"), halfLifeDays = 7)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m("a") == ((4L, 0L, 3000000L)), s"got $m")
    assert(m("b") == ((1L, 7L, 500000L)), s"got $m")
  }

  test("decayedPopularity: the halving cap keeps ancient events above zero weight") {
    val rows = onDay(0, 1) ++ onDay(1000, 1) // age 1000 -> 142 halvings, capped 19
    val m = TimeSeries.decayedPopularity(rows.toDF("k", "ts"),
        col("k"), col("ts"), halfLifeDays = 7)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m("a") == ((2L, 0L, 1000000L + 1000000L / (1L << 19))), s"got $m")
  }

  test("property: mannKendall is antisymmetric under time reversal (S flips, var18 holds)") {
    val counts = Seq(4, 1, 7, 2, 9, 3, 5)
    val fwd = counts.zipWithIndex.flatMap { case (n, d) => onDay(d, n) }
    val rev = counts.reverse.zipWithIndex.flatMap { case (n, d) => onDay(d, n) }
    def run(rows: Seq[(String, Timestamp)]) =
      TimeSeries.mannKendall(rows.toDF("k", "ts"), col("k"), col("ts"))
        .collect().map(r => (r.getLong(2), r.getLong(3))).head
    val (sF, vF) = run(fwd); val (sR, vR) = run(rev)
    assert(sF == -sR && vF == vR, s"fwd ($sF,$vF) rev ($sR,$vR)")
  }

  test("property: acfPpm is invariant to adding a constant to every day's count") {
    val counts = Seq(2, 5, 1, 6, 3, 4)
    def run(extra: Int) = {
      val rows = counts.zipWithIndex.flatMap { case (n, d) => onDay(d, n + extra) }
      TimeSeries.acfPpm(rows.toDF("k", "ts"), col("k"), col("ts"), maxLag = 3)
        .collect().map(r => r.getInt(1) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    }
    // c_t = n*y_t - S is exactly shift-invariant: +10 everywhere, same ACF
    assert(run(0) == run(10))
  }

  test("property: crossCorrPpm mirrors under key swap — r2(a,b,l) = r2 at the overlap of (b,a,-l)") {
    // keys chosen so swapping the SERIES (not the names) flips the lag:
    // attach series X to key a / Y to key b, then X to b / Y to a —
    // pair ordering stays (a, b), so the correlation must appear at -l
    val x = Seq(1, 2, 9, 2, 1, 5); val y = Seq(3, 1, 4, 8, 2, 2)
    def rows(first: Seq[Int], second: Seq[Int]) =
      first.zipWithIndex.flatMap { case (n, d) => onDay(d, n, "a") } ++
        second.zipWithIndex.flatMap { case (n, d) => onDay(d, n, "b") }
    def run(first: Seq[Int], second: Seq[Int]) =
      TimeSeries.crossCorrPpm(rows(first, second).toDF("k", "ts"),
          col("k"), col("ts"), maxLag = 2)
        .collect().map(r => r.getLong(2) ->
          (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    val ab = run(x, y); val ba = run(y, x)
    (-2L to 2L).foreach { l =>
      assert(ab(l) == ba(-l), s"lag $l: ${ab(l)} vs ${ba(-l)}")
    }
  }

  test("mannKendall: a long monotone run clears significance") {
    val rows = (0 until 12).flatMap(d => onDay(d, d + 1))
    val r = TimeSeries.mannKendall(rows.toDF("k", "ts"), col("k"), col("ts"))
      .collect().head
    assert(r.getLong(2) == 66L && r.getBoolean(5), s"got $r") // S = C(12,2)
  }
}
