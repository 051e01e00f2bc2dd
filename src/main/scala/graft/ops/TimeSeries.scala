package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling operators.
  *
  * Scale shape: gap filling is one per-key aggregate (min/max span), a
  * generator over the span (no data movement — rows are produced where
  * the key row lives), and one left join back onto the per-bucket
  * aggregates, shuffled on (key, bucket). Span explosion is bounded by
  * `maxBuckets` so a single pathological key (one event in 1970, one
  * today) cannot OOM an executor — at 100 TB that guard is the
  * difference between a linear operator and a stuck stage.
  */
object TimeSeries {

  /** Per-key, per-day event counts with missing days zero-filled across
    * each key's observed [min-day, max-day] span. Output: key, `day_sec`
    * (epoch seconds of day start, BIGINT), `n_events` (0 for gap days).
    *
    * NOT a silent cap: a key whose span exceeds `maxBuckets` days is
    * DROPPED from the output entirely (not truncated) — callers that
    * need those keys should pre-split their spans or raise the bound;
    * rows with NULL timestamps never join a day bucket and are excluded.
    */
  def gapFillDaily(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      maxBuckets: Int = 100000
  ): DataFrame = {
    val daySec = (floor(unix_timestamp(tsCol) / 86400L) * 86400L).cast("long")
    // counts feed BOTH the span aggregate and the final join — without
    // materialization the raw table is scanned twice (plan-audited);
    // the per-(key, day) aggregate is tiny relative to raw, so cutting
    // lineage here is the 100 TB-correct shape.
    val counts = df.select(keyCol.as("key"), daySec.as("day_sec"))
      .groupBy("key", "day_sec")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val spans = counts.groupBy("key")
      .agg(min(col("day_sec")).as("lo"), max(col("day_sec")).as("hi"))
      .filter((col("hi") - col("lo")) / 86400L < maxBuckets)
    spans
      .select(col("key"),
        explode(sequence(col("lo"), col("hi"), lit(86400L))).as("day_sec"))
      .join(counts, Seq("key", "day_sec"), "left")
      .select(col("key"), col("day_sec"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }

  /** INTEGER rolling z-score anomaly flags over the gap-filled daily
    * series: day `x` is anomalous against its trailing `window` days
    * (current day excluded) iff `(n·x − s)² > z²·(n·q − s²)` — the
    * z-score test cross-multiplied so every term is a BIGINT (`n` =
    * trailing days present, `s`/`q` = their sum / sum of squares). No
    * float mean or stddev ever materializes, so the flag is bit-exact
    * across engines, partitionings, and merge orders. A zero-variance
    * window flags ANY deviation (the algebra degenerates to
    * `n·x ≠ s`); the first `minPrior` days per key are unflagged
    * warm-up. This is the telemetry-alerting extension of the
    * reference's threshold rule (`PythonKafkaSink/main.py:83` flags
    * `temp > 80` statically; this flags "unusual for this stream").
    *
    * Scale shape: [[gapFillDaily]]'s aggregate (corpus → one tiny
    * (key, day) row per cell) then one per-key window pass over the
    * CELL table — the raw log is scanned once. Overflow bound: terms
    * grow as `(window · daily_count)²`, exact in BIGINT up to ~10⁸
    * events/key/day (ANSI mode fails loudly past it — switch `s`/`q`
    * to DECIMAL(38,0) beyond that, same algebra).
    */
  def rollingAnomalies(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      window: Int = 7,
      z: Int = 3,
      minPrior: Int = 3
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("day_sec"))
      .rowsBetween(-window, -1)
    val x = col("n_events")
    gapFillDaily(df, keyCol, tsCol)
      .withColumn("__np", count(lit(1)).over(w))
      .withColumn("__s", sum(x).over(w))
      .withColumn("__q", sum(x * x).over(w))
      .withColumn("is_anomaly",
        col("__np") >= minPrior &&
          (col("__np") * x - col("__s")) * (col("__np") * x - col("__s")) >
            lit(z.toLong * z) * (col("__np") * col("__q") - col("__s") * col("__s")))
      .select(col("key"), col("day_sec"), col("n_events"), col("is_anomaly"))
  }

  /** Rolling active-users series: for every observed day, the EXACT
    * distinct-entity count that day (DAU) and over the trailing
    * `window` days ending that day (WAU/MAU by choice of `window`).
    *
    * A rolling DISTINCT cannot ride a window frame (distinct does not
    * decompose over frames), and re-scanning the log per day is
    * quadratic — so the log first collapses to distinct (entity, day)
    * CELLS (the small table: ≤ actives × days), and each cell
    * fans out to the `window` day-buckets it keeps its entity active
    * in (a bounded ×window explode of the CELL table, not the log).
    * One count-distinct per target day closes it. Output rows are the
    * OBSERVED days (≥1 active entity that day) — the reporting spine;
    * gap days belong to [[gapFillDaily]]'s contract, not this one.
    *
    * Scale: log → cells is one shuffle with map-side partial distinct;
    * the explode multiplies CELLS by `window` (7 or 30), bounded and
    * predictable; final aggregate shuffles on the day. At 100 TB the
    * cells table is the thing to persist daily — then each day's
    * update touches one new day of cells, never history.
    */
  def rollingActiveUsers(
      df: DataFrame,
      entityCol: Column,
      tsCol: Column,
      window: Int = 7
  ): DataFrame = {
    require(window >= 1, "window must be >= 1 day")
    val daySec = (floor(unix_timestamp(tsCol) / 86400L) * 86400L).cast("long")
    val cells = df.filter(tsCol.isNotNull)
      .select(entityCol.as("entity"), daySec.as("day_sec")).distinct()
    val dau = cells.groupBy("day_sec")
      .agg(count_distinct(col("entity")).as("dau"))
    // fan each cell out to the `window` trailing-window anchor days it
    // contributes to, then keep anchors that are real observed days
    val contrib = cells.select(col("entity"),
      explode(sequence(lit(0), lit(window - 1))).as("k"), col("day_sec"))
      .select(col("entity"), (col("day_sec") + col("k") * 86400L).as("day_sec"))
    val wau = contrib.groupBy("day_sec")
      .agg(count_distinct(col("entity")).as("wau"))
    dau.join(wau, Seq("day_sec"))
      .select(col("day_sec"), col("dau"), col("wau"))
  }

  /** Per-key interval-union coverage: merge overlapping/adjacent
    * half-open `[start, end)` intervals and report the merged-island
    * count and total covered length — the utilization/uptime primitive
    * (session seconds actually covered, device on-air time, ad
    * exposure) that a plain `sum(end − start)` double-counts whenever
    * intervals overlap. Intervals are half-open, so `[1,3)` and `[3,5)`
    * are adjacent and merge; callers pass integer (epoch-seconds)
    * bounds, keeping every length exact.
    *
    * Formulation: the classic sweep — an interval starts a new island
    * iff its start exceeds the running max end of everything before it
    * (q91's gaps-and-islands generalized from point gaps to interval
    * overlap). Rows with NULL key/bounds and empty/negative intervals
    * (`end <= start`) are excluded — a zero-length interval covers
    * nothing and must not stitch two islands together.
    *
    * Scale shape: ONE shuffle (the per-key ordered window), island
    * aggregation partial map-side, per-key rollup on the same
    * partitioning. Key cardinality distributes; a single pathological
    * key serializes its own window — the documented sessionize
    * contract (`q91`), salting is the caller-side remedy.
    */
  def intervalUnion(
      df: DataFrame,
      keyCol: Column,
      startCol: Column,
      endCol: Column
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__k")).orderBy(col("__s"), col("__e"))
    df.select(keyCol.as("__k"), startCol.cast("long").as("__s"),
        endCol.cast("long").as("__e"))
      .filter(col("__k").isNotNull && col("__s").isNotNull && col("__e") > col("__s"))
      .withColumn("__pme",
        max(col("__e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__ni",
        when(col("__pme").isNull || col("__s") > col("__pme"), 1L).otherwise(0L))
      .withColumn("__gid",
        sum(col("__ni")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__k"), col("__gid"))
      .agg(min(col("__s")).as("__ss"), max(col("__e")).as("__ee"))
      .groupBy(col("__k").as("key"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("__ee") - col("__ss")).as("covered"))
  }

  /** Time-weighted average: each observation's value holds until the
    * key's next observation (piecewise-constant carry-forward), weighted
    * by its holding time — the correct mean for irregularly sampled
    * series (sensor readings, account balances, price feeds), where the
    * arithmetic mean over-weights bursts. All integer:
    * `twa = ⌊Σ vᵢ·Δtᵢ / Σ Δtᵢ⌋` over the key's observed span, with the
    * floor division spelled `(x − pmod(x, d)) DIV d` so negative sums
    * floor identically in every engine (SQL `DIV` truncates toward
    * zero, DuckDB `//` floors — the DSIR portability rule). Callers
    * pass integer timestamp-seconds and integer value units (e.g.
    * millis); `ordCol` breaks timestamp ties totally, otherwise
    * equal-time observations would split the zero-length segment
    * nondeterministically.
    *
    * Keys whose span is zero (single observation, or all observations
    * at one instant) have no time axis to weight over and are excluded.
    * Headroom: Σ v·Δt must fit BIGINT — value-millis ≤ 10⁹ over a
    * 30-year span is safe; corpus-scale sums beyond that need the
    * DECIMAL(38) variant of the same plan.
    *
    * Scale shape: one per-key ordered window (the lead), one aggregate
    * on the same partitioning — the q91/q155 sweep family.
    */
  def timeWeightedAvg(
      df: DataFrame,
      keyCol: Column,
      tsSecCol: Column,
      valCol: Column,
      ordCol: Column
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__o"))
    df.select(keyCol.as("__k"), tsSecCol.cast("long").as("__t"),
        valCol.cast("long").as("__v"), ordCol.as("__o"))
      .filter(col("__k").isNotNull && col("__t").isNotNull && col("__v").isNotNull)
      .withColumn("__nt", lead(col("__t"), 1).over(w))
      .groupBy(col("__k").as("key"))
      .agg(count(lit(1)).as("n_obs"),
        sum(when(col("__nt").isNull, 0L)
          .otherwise(col("__nt") - col("__t"))).as("span"),
        sum(when(col("__nt").isNull, 0L)
          .otherwise(col("__v") * (col("__nt") - col("__t")))).as("__wv"))
      .filter(col("span") > 0)
      .withColumn("twa", expr("(__wv - pmod(__wv, span)) DIV span"))
      .drop("__wv")
  }

  /** Trailing EWMA — exponential smoothing over each key's last
    * `weights.size` observations in (time, tiebreak) order, the trend
    * line for irregular integer series (sensor drift, quality-score
    * drift across crawls). `weights.head` multiplies the CURRENT
    * observation, `weights(k)` the k-th lag; missing lags (series
    * head) renormalize by dropping their weight, so early rows are the
    * EWMA of what exists rather than decayed toward zero. The default
    * half-life-of-one weights `128,64,…,1` make the classic α=½ EWMA
    * EXACT in integers over an 8-sample horizon (the dropped tail
    * weight is <1/256 of the total) — floating-point decay would make
    * engine parity a rounding lottery.
    *
    * `ewma = Σ wₖ·x₍ₜ₋ₖ₎ floordiv Σ wₖ` (portable floor division, so
    * negative series floor identically on every engine).
    *
    * Scale shape: ONE per-key ordered window evaluating K codegen'd
    * `lag` taps — one shuffle + sort, no self-join, no explode; K is a
    * literal, so the whole tap chain stays inside whole-stage codegen.
    */
  def ewmaTrailing(
      df: DataFrame,
      keyCol: Column,
      tsSecCol: Column,
      valCol: Column,
      ordCol: Column,
      weights: Seq[Long] = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L)
  ): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__o"))
    val base = df.select(keyCol.as("__k"), tsSecCol.cast("long").as("__t"),
        valCol.cast("long").as("__v"), ordCol.as("__o"))
      .filter(col("__k").isNotNull && col("__t").isNotNull && col("__v").isNotNull)
    val taps = weights.zipWithIndex.map { case (wk, k) =>
      val x = if (k == 0) col("__v") else lag(col("__v"), k).over(w)
      (when(x.isNotNull, x * lit(wk)).otherwise(lit(0L)),
        when(x.isNotNull, lit(wk)).otherwise(lit(0L)))
    }
    base
      .withColumn("__num", taps.map(_._1).reduce(_ + _))
      .withColumn("__den", taps.map(_._2).reduce(_ + _))
      .select(col("__k").as("key"), col("__t").as("t"), col("__o").as("ord"),
        col("__v").as("v"),
        expr("(__num - pmod(__num, __den)) DIV __den").as("ewma"))
  }

  /** Inter-arrival cadence profile: per key, the distribution of gaps
    * between consecutive events (seconds) as exact rank percentiles —
    * the dual of [[peakRate]]: peaks catch bursts, gap percentiles
    * catch STALLS (a p90 gap creeping up is a dying source long
    * before the peak moves). Ordering ties break on `ordCol` (the
    * q157 convention); keys with fewer than two events have no gaps
    * and no row.
    *
    * Scale shape: one per-key sort window for the lag, a second
    * rank window on the SAME partitioning (no extra shuffle), one
    * aggregate — the q57 percentile family.
    */
  def interArrivalStats(
      df: DataFrame,
      keyCol: Column,
      tsSecCol: Column,
      ordCol: Column
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__o"))
    val gaps = df.select(keyCol.as("__k"), tsSecCol.cast("long").as("__t"),
        ordCol.as("__o"))
      .filter(col("__k").isNotNull && col("__t").isNotNull)
      .withColumn("__g", col("__t") - lag(col("__t"), 1).over(w))
      .filter(col("__g").isNotNull)
    val wr = Window.partitionBy(col("__k")).orderBy(col("__g"))
    val wn = Window.partitionBy(col("__k"))
    gaps
      .withColumn("__rn", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(wn))
      .groupBy(col("__k").as("key"))
      // integer ceil-division ranks: ⌈p·n⌉ computed as (n·num + den − 1)
      // DIV den, never as ceil(n * double) — IEEE makes 20·0.9 land at
      // 18.000000000000004, so the double spelling picks rank 19 where
      // the mathematical ⌈0.9·20⌉ is 18 (the house integer-exactness
      // convention; oracle spells the same // arithmetic)
      .agg(max(col("__n")).as("n_gaps"),
        max(when(col("__rn") === expr("(__n + 1) DIV 2"), col("__g")))
          .as("p50_gap_sec"),
        max(when(col("__rn") === expr("(__n * 9 + 9) DIV 10"), col("__g")))
          .as("p90_gap_sec"),
        max(col("__g")).as("max_gap_sec"))
  }

  /** Peak event rate — each key's maximum event count inside ANY
    * trailing `windowSec`-second window, computed exactly with a RANGE
    * frame over epoch seconds (`[t − windowSec + 1, t]`, so a window
    * is any closed span of `windowSec` distinct seconds). The burst
    * detector: rate LIMITS are set against the peak, not the mean, and
    * a per-key mean hides every burst.
    *
    * Scale shape: one per-key sort window (the RANGE frame) + one
    * aggregate on the same partitioning — the q69 RANGE-frame family;
    * no self-join over the event table, which is the naive spelling's
    * O(n·window) trap.
    */
  def peakRate(
      df: DataFrame,
      keyCol: Column,
      tsSecCol: Column,
      windowSec: Long
  ): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rangeBetween(-(windowSec - 1), 0)
    df.select(keyCol.as("__k"), tsSecCol.cast("long").as("__t"))
      .filter(col("__k").isNotNull && col("__t").isNotNull)
      .withColumn("__c", count(lit(1)).over(w))
      .groupBy(col("__k").as("key"))
      .agg(count(lit(1)).as("n_events"), max(col("__c")).as("peak"))
  }

  /** Per-key linear trend over a daily series — exact integer OLS: the
    * slope of `y` (daily event count) against the day index is the
    * RATIONAL `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`, and both legs are
    * emitted as exact BIGINTs (`slope_num`, `slope_den`, den > 0 for
    * n ≥ 2 distinct days) instead of a divided float — division is the
    * CONSUMER'S rounding decision, and a signed integral division
    * would hit the DIV-vs-floor cross-engine trap this repo's integer
    * convention exists to avoid. `slope_num > 0` means growing,
    * cross-multiply `slope_num·den'` to compare two keys' slopes
    * exactly. Day indices are re-based per key (x = day − min day), so
    * magnitudes stay far from BIGINT overflow for any epoch.
    *
    * Keys with a single observed day have no defined slope and are
    * emitted with `(0, 0)` — explicitly undefined, not NULL (the q188
    * convention).
    *
    * Scale shape: one (key, day) pre-aggregate (map-side partials),
    * one per-key rollup of five sums — no window, no sort.
    */
  def trendSlopes(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column
  ): DataFrame = {
    val daily = df.filter(keyCol.isNotNull && tsCol.isNotNull)
      .select(keyCol.as("key"), unix_timestamp(tsCol).cast("long").as("__ep"))
      .withColumn("day", expr("__ep DIV 86400"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("y"))
    daily
      .groupBy("key")
      .agg(count(lit(1)).as("n_days"), min(col("day")).as("__d0"),
        sum(col("y")).as("__sy"),
        sum(col("day") * col("y")).as("__sdy"),
        sum(col("day")).as("__sd"),
        sum(col("day") * col("day")).as("__sdd"))
      // rebase x = day − min(day) algebraically: Σx = Σd − n·d0,
      // Σx² = Σd² − 2·d0·Σd + n·d0², Σxy = Σdy − d0·Σy
      .withColumn("__sx", col("__sd") - col("n_days") * col("__d0"))
      .withColumn("__sxx", col("__sdd") - lit(2L) * col("__d0") * col("__sd")
        + col("n_days") * col("__d0") * col("__d0"))
      .withColumn("__sxy", col("__sdy") - col("__d0") * col("__sy"))
      .withColumn("slope_num",
        col("n_days") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("slope_den",
        col("n_days") * col("__sxx") - col("__sx") * col("__sx"))
      .select(col("key"), col("n_days"), col("__sy").as("n_events"),
        when(col("slope_den") > 0, col("slope_num")).otherwise(lit(0L)).as("slope_num"),
        when(col("slope_den") > 0, col("slope_den")).otherwise(lit(0L)).as("slope_den"))
  }

  /** Theil–Sen robust trend per key — the MEDIAN of all pairwise daily
    * slopes, the estimator that shrugs off the outlier days that drag
    * [[trendSlopes]]' least-squares line around (up to ~29% arbitrary
    * corruption). Slopes are emitted in integer ppm units: each pair's
    * slope floors as `(Δy·10⁶) DIV Δdays` (positive denominator, so
    * `pmod` flooring is exact for negative rises too), and the median
    * is the house `(n+1) DIV 2` rank over the total
    * (slope, day_a, day_b) order — integers end to end, no IEEE
    * boundary.
    *
    * Keys with fewer than 2 observed days have no pair and are
    * EXCLUDED (a one-point trend is not a trend). Scale: the pair
    * build is a per-key self equi-join — O(days²) pairs per key — so
    * the intended grain is a PRE-AGGREGATED series (daily cells, as
    * here): a year is ~66k pairs per key. Raw-event grains need the
    * [[gapFillDaily]]-style rollup first, which this operator performs
    * on its own input (per-key DAILY counts, like [[trendSlopes]]).
    */
  def theilSenSlope(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column
  ): DataFrame = {
    val daily = df.filter(keyCol.isNotNull && tsCol.isNotNull)
      .select(keyCol.as("key"), unix_timestamp(tsCol).cast("long").as("__ep"))
      .withColumn("day", expr("__ep DIV 86400"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("y"))
    val a = daily.select(col("key"), col("day").as("d1"), col("y").as("y1"))
    val b = daily.select(col("key"), col("day").as("d2"), col("y").as("y2"))
    val pairs = a.join(b, Seq("key")).filter(col("d2") > col("d1"))
      .withColumn("__num", (col("y2") - col("y1")) * lit(1000000L))
      .withColumn("__den", col("d2") - col("d1"))
      .withColumn("slope_ppm",
        expr("(__num - pmod(__num, __den)) DIV __den"))
    val wr = Window.partitionBy(col("key"))
      .orderBy(col("slope_ppm"), col("d1"), col("d2"))
    val wn = Window.partitionBy(col("key"))
    pairs
      .withColumn("__rn", row_number().over(wr))
      .withColumn("n_pairs", count(lit(1)).over(wn))
      .groupBy("key")
      .agg(max(col("n_pairs")).as("n_pairs"),
        max(when(col("__rn") === expr("(n_pairs + 1) DIV 2"),
          col("slope_ppm"))).as("slope_ppm_median"))
  }

  /** Single-split changepoint per key (the binary-segmentation step):
    * over the per-key DAILY count series, find the split that maximizes
    * the between-segment variance reduction — "did this series change
    * level, and when". For a split after rank `t` of `n` points with
    * prefix sum `S_t` and total `S`, the gain is proportional to
    * `(S_t·n − S·t)² / (t·(n−t)·n)`; the operator compares the FLOORED
    * micro-scaled gain `⌊A²·10⁶ / B⌋` computed in DECIMAL(38,0) (A² can
    * pass 2⁶³ scaled — the [[graft.ops.Profile]] histogram precedent),
    * ties broken by earliest split — both rules exact on any engine.
    *
    * Output per key (keys with a single observed day excluded):
    * `n_days`, the boundary `split_day` (last day of the left segment),
    * `left_n`/`left_sum`/`right_sum`, and `gain_micro`. Whether the
    * gain is SIGNIFICANT is the caller's threshold (or a permutation
    * test); this operator's job is the exact argmax. Recursing into
    * the two halves yields multi-changepoint segmentation.
    *
    * Scale: one shuffle — rollup, both running windows, and the argmax
    * rank all share the key partitioning.
    */
  def changepoint(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column
  ): DataFrame = {
    val daily = df.filter(keyCol.isNotNull && tsCol.isNotNull)
      .select(keyCol.as("key"), unix_timestamp(tsCol).cast("long").as("__ep"))
      .withColumn("day", expr("__ep DIV 86400"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("y"))
    val wo = Window.partitionBy(col("key")).orderBy(col("day"))
    val wk = Window.partitionBy(col("key"))
    val cand = daily
      .withColumn("rn", row_number().over(wo))
      .withColumn("cum", sum(col("y")).over(wo))
      .withColumn("n", count(lit(1)).over(wk))
      .withColumn("tot", sum(col("y")).over(wk))
      .filter(col("rn") < col("n"))
      .withColumn("__a", col("cum") * col("n") - col("tot") * col("rn"))
      .withColumn("gain_micro", expr(
        "CAST((CAST(__a AS DECIMAL(38,0)) * __a * 1000000)" +
          " DIV (rn * (n - rn) * n) AS BIGINT)"))
    val pick = Window.partitionBy(col("key"))
      .orderBy(col("gain_micro").desc, col("rn"))
    cand
      .withColumn("__pick", row_number().over(pick))
      .filter(col("__pick") === 1)
      .select(col("key"), col("n").as("n_days"), col("day").as("split_day"),
        col("rn").as("left_n"), col("cum").as("left_sum"),
        (col("tot") - col("cum")).as("right_sum"), col("gain_micro"))
  }

  /** Rolling-origin (expanding-window) backtest folds — the
    * time-series analog of k-fold CV, where random splits would leak
    * the future into training: fold `i` of `k` tests on the `horizon`
    * days ending `(k−i)·horizon` days before the LAST observed day and
    * trains on everything strictly before its test window. Returns the
    * fold audit table (`fold`, `train_end_day`, `n_train`, `n_test`) —
    * the artifact that catches "fold 3 trains on 12 rows" before a
    * model does. Day grid is anchored on the observed max day, so the
    * split is a pure function of the data.
    *
    * Scale: one row-level pass against a k-row broadcast grid (every
    * row lands in ≤ k train sets and ≤ 1 test set), then an aggregate
    * to 2k cells.
    */
  def rollingOriginFolds(
      df: DataFrame,
      tsCol: Column,
      k: Int,
      horizonDays: Int
  ): DataFrame = {
    require(k >= 1 && horizonDays >= 1, "need k >= 1 and horizonDays >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val days = df.filter(tsCol.isNotNull)
      .select((unix_timestamp(tsCol).cast("long")).as("__ep"))
      .withColumn("day", expr("__ep DIV 86400"))
    val grid = (1 to k).toDF("fold")
    days
      .crossJoin(broadcast(grid.crossJoin(
        days.agg(max(col("day")).as("__dmax")))))
      .withColumn("__test_hi", col("__dmax") - (lit(k) - col("fold")) * horizonDays)
      .withColumn("__test_lo", col("__test_hi") - horizonDays + 1)
      .withColumn("__role",
        when(col("day") < col("__test_lo"), "train")
          .when(col("day") <= col("__test_hi"), "test"))
      // NO role filter: a fold whose windows hold zero rows must still
      // emit its (0, 0) audit row — that undersized fold is exactly
      // what the table exists to catch
      .groupBy(col("fold").cast("long").as("fold"))
      .agg(max(col("__test_lo") - 1).as("train_end_day"),
        sum(when(col("__role") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("__role") === "test", 1L).otherwise(0L)).as("n_test"))
  }

  /** Seasonal-naive forecast backtest — the baseline every real
    * forecaster must beat: predict each of the last `horizonDays`
    * days' count as the count `seasonDays` earlier (missing days are
    * zero, on both sides — a day with no events is an observation,
    * not a gap), and score per key with EXACT integer errors: total
    * absolute error and `mae_ppm = ⌊Σ|e|·10⁶ / horizonDays⌋`.
    *
    * Scale: daily rollup (one shuffle), the scoring grid is
    * `keys × horizonDays` rows built from a per-key one-row aggregate
    * — no gap-fill of the whole history, only the scored window.
    */
  def seasonalNaiveBacktest(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      horizonDays: Int,
      seasonDays: Int
  ): DataFrame = {
    require(horizonDays >= 1 && seasonDays >= 1,
      "need horizonDays >= 1 and seasonDays >= 1")
    val daily = df.filter(keyCol.isNotNull && tsCol.isNotNull)
      .select(keyCol.as("key"), unix_timestamp(tsCol).cast("long").as("__ep"))
      .withColumn("day", expr("__ep DIV 86400"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("y"))
    val dmax = daily.agg(max(col("day")).as("__dmax"))
    val grid = daily.select(col("key")).distinct()
      .crossJoin(broadcast(dmax))
      .select(col("key"), explode(sequence(
        col("__dmax") - (horizonDays - 1), col("__dmax"))).as("day"))
    val actual = daily.withColumnRenamed("y", "__ya")
    val lagged = daily
      .select(col("key"), (col("day") + seasonDays).as("day"),
        col("y").as("__yp"))
    grid
      .join(actual, Seq("key", "day"), "left")
      .join(lagged, Seq("key", "day"), "left")
      .withColumn("__ae", abs(coalesce(col("__ya"), lit(0L)) -
        coalesce(col("__yp"), lit(0L))))
      .groupBy("key")
      .agg(count(lit(1)).as("n_days"), sum(col("__ae")).as("total_ae"),
        expr(s"(sum(__ae) * 1000000) DIV $horizonDays").as("mae_ppm"))
  }

  /** Split-conformal prediction intervals for the seasonal-naive
    * forecaster — the distribution-free way to put HONEST error bars
    * on a forecast: the interval width is the
    * `⌈(n+1)(1−α)⌉`-th smallest absolute residual on a calibration
    * window disjoint from the test window, which guarantees
    * `P(actual ∈ interval) ≥ 1−α` with NO distributional assumptions
    * (Vovk et al.; the finite-sample exchangeability argument).
    *
    * Windows, newest last: … | calibration (`calibDays`) | test
    * (`horizonDays`) |. Missing days count as 0 on both sides (a
    * day with no events is an observation — [[seasonalNaiveBacktest]]'s
    * convention). Everything is integer-exact: residuals are count
    * differences, the width is a rank-selected order statistic
    * (`k = ⌈(n+1)(10⁶−alphaPpm)/10⁶⌉`, ties broken by day — value-
    * deterministic), coverage is an exact ppm ratio. `k > n` (too few
    * calibration days for the requested confidence) yields NULL width
    * and coverage — the conformal interval is infinite, not huge.
    *
    * Output per key: `(key, n_calib, width, n_test, n_covered,
    * coverage_ppm)` — the conformal guarantee says `coverage_ppm ≳
    * 10⁶ − alphaPpm` on exchangeable data; a big shortfall means the
    * series drifted between calibration and test.
    *
    * Scale: daily rollup (one shuffle); every later frame is
    * `keys × (calibDays + horizonDays)` rows — window-bounded, not
    * corpus-bounded.
    */
  def conformalInterval(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      horizonDays: Int,
      seasonDays: Int,
      calibDays: Int,
      alphaPpm: Long = 100000L
  ): DataFrame = {
    require(horizonDays >= 1 && seasonDays >= 1 && calibDays >= 1,
      "need horizonDays, seasonDays, calibDays >= 1")
    require(alphaPpm > 0L && alphaPpm < 1000000L, "alphaPpm in (0, 1e6)")
    val daily = df.filter(keyCol.isNotNull && tsCol.isNotNull)
      .select(keyCol.as("key"), unix_timestamp(tsCol).cast("long").as("__ep"))
      .withColumn("day", expr("__ep DIV 86400"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("y"))
    val dmax = daily.agg(max(col("day")).as("__dmax"))
    def grid(loOff: Int, hiOff: Int) = daily.select(col("key")).distinct()
      .crossJoin(broadcast(dmax))
      .select(col("key"),
        explode(sequence(col("__dmax") + loOff, col("__dmax") + hiOff))
          .as("day"))
    val actual = daily.withColumnRenamed("y", "__ya")
    val lagged = daily
      .select(col("key"), (col("day") + seasonDays).as("day"),
        col("y").as("__yp"))
    def withResid(g: DataFrame) = g
      .join(actual, Seq("key", "day"), "left")
      .join(lagged, Seq("key", "day"), "left")
      .withColumn("__r", abs(coalesce(col("__ya"), lit(0L)) -
        coalesce(col("__yp"), lit(0L))))
    // k-th smallest calibration residual, k = ceil((n+1)(1e6-alpha)/1e6)
    val k = ((calibDays + 1L) * (1000000L - alphaPpm) + 999999L) / 1000000L
    val qhat = withResid(grid(-(horizonDays + calibDays) + 1, -horizonDays))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("__r"), col("day"))))
      .filter(col("__rn") === k)
      .select(col("key"), col("__r").as("width"))
    withResid(grid(-horizonDays + 1, 0))
      .join(qhat, Seq("key"), "left")
      .groupBy("key")
      .agg(lit(calibDays.toLong).as("n_calib"),
        max(col("width")).as("width"),
        count(lit(1)).as("n_test"),
        sum(when(col("__r") <= col("width"), 1L).otherwise(0L)).as("n_cov"))
      .withColumn("n_covered",
        when(col("width").isNotNull, col("n_cov")))
      .withColumn("coverage_ppm", expr(
        "CASE WHEN width IS NOT NULL THEN (n_cov * 1000000) DIV n_test END"))
      .select(col("key"), col("n_calib"), col("width"), col("n_test"),
        col("n_covered"), col("coverage_ppm"))
  }

  /** Interrupted-time-series intervention impact with an honest
    * conformal band — the deterministic skeleton of the CausalImpact
    * readout: the last `postDays` days are the post-intervention
    * window, the counterfactual is the season-lagged pre-intervention
    * value (`postDays ≤ seasonDays` REQUIRED so every lag lands
    * strictly before the intervention), and the cumulative effect
    * `Σ(actual − counterfactual)` is judged against a conformal band:
    * the [[conformalInterval]] calibration-quantile width `q̂` times
    * `postDays` — a union bound, CONSERVATIVE by construction (a real
    * effect that clears it clears any tighter bound; documented
    * trade-off for keeping the guarantee assumption-free).
    *
    * Everything is integer: daily counts, residuals, the rank-selected
    * `q̂`, the signed effect, the cleared relative effect
    * `effect·10⁶ DIV Σcounterfactual`. `q̂` undefined (k > n) or a
    * zero counterfactual total yields NULLs, not guesses.
    *
    * Output per key: `(key, n_post, actual_total, forecast_total,
    * effect_total, width, band, rel_effect_ppm, significant)`.
    *
    * Scale: [[conformalInterval]]'s profile — one daily rollup
    * shuffle, then keys × window-days frames.
    */
  def interventionImpact(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      postDays: Int,
      seasonDays: Int,
      calibDays: Int,
      alphaPpm: Long = 100000L
  ): DataFrame = {
    require(postDays >= 1 && seasonDays >= 1 && calibDays >= 1,
      "need postDays, seasonDays, calibDays >= 1")
    require(postDays <= seasonDays,
      "postDays must not exceed seasonDays: counterfactual lags must land " +
        "strictly before the intervention")
    require(alphaPpm > 0L && alphaPpm < 1000000L, "alphaPpm in (0, 1e6)")
    val daily = df.filter(keyCol.isNotNull && tsCol.isNotNull)
      .select(keyCol.as("key"), unix_timestamp(tsCol).cast("long").as("__ep"))
      .withColumn("day", expr("__ep DIV 86400"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("y"))
    val dmax = daily.agg(max(col("day")).as("__dmax"))
    def grid(loOff: Int, hiOff: Int) = daily.select(col("key")).distinct()
      .crossJoin(broadcast(dmax))
      .select(col("key"),
        explode(sequence(col("__dmax") + loOff, col("__dmax") + hiOff))
          .as("day"))
    val actual = daily.withColumnRenamed("y", "__ya")
    val lagged = daily
      .select(col("key"), (col("day") + seasonDays).as("day"),
        col("y").as("__yp"))
    def joined(g: DataFrame) = g
      .join(actual, Seq("key", "day"), "left")
      .join(lagged, Seq("key", "day"), "left")
      .withColumn("__a", coalesce(col("__ya"), lit(0L)))
      .withColumn("__f", coalesce(col("__yp"), lit(0L)))
    val k = ((calibDays + 1L) * (1000000L - alphaPpm) + 999999L) / 1000000L
    val qhat = joined(grid(-(postDays + calibDays) + 1, -postDays))
      .withColumn("__r", abs(col("__a") - col("__f")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("__r"), col("day"))))
      .filter(col("__rn") === k)
      .select(col("key"), col("__r").as("width"))
    joined(grid(-postDays + 1, 0))
      .join(qhat, Seq("key"), "left")
      .groupBy("key")
      .agg(count(lit(1)).as("n_post"),
        sum(col("__a")).as("actual_total"),
        sum(col("__f")).as("forecast_total"),
        sum(col("__a") - col("__f")).as("effect_total"),
        max(col("width")).as("width"))
      .withColumn("band", expr(s"width * $postDays"))
      .withColumn("rel_effect_ppm", expr(
        "CASE WHEN forecast_total > 0 THEN" +
          " (CAST(effect_total AS DECIMAL(38,0)) * 1000000)" +
          " DIV forecast_total END"))
      .withColumn("significant",
        when(col("band").isNotNull, abs(col("effect_total")) > col("band")))
      .select(col("key"), col("n_post"), col("actual_total"),
        col("forecast_total"), col("effect_total"), col("width"),
        col("band"), col("rel_effect_ppm"), col("significant"))
  }

  /** Holt's linear-trend forecast (double exponential smoothing) as a
    * DETERMINISTIC integer recurrence — the trend-capable upgrade of
    * the seasonal-naive baseline: per key, over the gap-filled daily
    * series (missing days are 0-observations), level and trend update
    * in MILLI-units with a floor per step —
    * `l ← (α·y·10³ + (10⁶−α)·(l+b)) DIV 10⁶`,
    * `b ← (β·(l−l_prev) + (10⁶−β)·b) DIV 10⁶` — initialized at
    * `l = y₀·10³, b = 0`. α/β are ppm literals; every step replays on
    * any engine (oracle: recursive CTE; here: the [[graft.ops.Stats
    * .kaplanMeier]] `aggregate`-HOF scan over the per-key day array).
    * Milli lanes keep `(10⁶−α)·(l+b)` inside BIGINT for daily counts
    * up to ~9·10⁹ per key. The one-step-ahead in-sample absolute
    * error `Σ|y_t·10³ − (l+b)_prev|` rides along as the fit
    * diagnostic.
    *
    * Output: one row per (key, h) for `h = 1..horizonDays` with the
    * linear forecast `l + h·b` (milli-units, can go negative — counts
    * clamp at the CONSUMER's discretion, the estimator stays honest)
    * plus the per-key `n_days`, final `level_milli`/`trend_milli`,
    * and `sae_milli`.
    *
    * Scale: daily rollup (one shuffle) → per-key day arrays bounded by
    * the day SPAN, not the corpus → one map-side scan.
    */
  def holtForecast(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      horizonDays: Int,
      alphaPpm: Long = 300000L,
      betaPpm: Long = 100000L
  ): DataFrame = {
    require(horizonDays >= 1, "horizonDays must be at least 1")
    require(alphaPpm > 0 && alphaPpm <= 1000000L &&
      betaPpm > 0 && betaPpm <= 1000000L, "alpha/beta in (0, 1e6] ppm")
    val daily = df.filter(keyCol.isNotNull && tsCol.isNotNull)
      .select(keyCol.as("key"), unix_timestamp(tsCol).cast("long").as("__ep"))
      .withColumn("day", expr("__ep DIV 86400"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("y"))
    // gap-filled per-key day series, collected to a span-bounded array
    val series = daily.groupBy("key")
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"),
        map_from_entries(collect_list(struct(col("day"), col("y"))))
          .as("__m"))
      .withColumn("ys", expr(
        "transform(sequence(__d0, __d1)," +
          " d -> coalesce(__m[d], CAST(0 AS BIGINT)))"))
      .select(col("key"), size(col("ys")).cast("long").as("n_days"),
        col("ys"))
    val a = alphaPpm; val b = betaPpm
    series
      .withColumn("st", expr(
        s"""aggregate(slice(ys, 2, size(ys) - 1),
           |  named_struct('l', element_at(ys, 1) * CAST(1000 AS BIGINT),
           |    'b', CAST(0 AS BIGINT), 'sae', CAST(0 AS BIGINT)),
           |  (acc, y) -> named_struct(
           |    'l', ($a * y * 1000 + (1000000 - $a) * (acc.l + acc.b))
           |      DIV 1000000,
           |    'b', ($b * (($a * y * 1000 + (1000000 - $a)
           |        * (acc.l + acc.b)) DIV 1000000 - acc.l)
           |      + (1000000 - $b) * acc.b) DIV 1000000,
           |    'sae', acc.sae + abs(y * 1000 - (acc.l + acc.b))))""".stripMargin))
      .select(col("key"), col("n_days"),
        col("st.l").as("level_milli"), col("st.b").as("trend_milli"),
        col("st.sae").as("sae_milli"),
        explode(expr(s"sequence(1, $horizonDays)")).as("h"))
      .withColumn("forecast_milli",
        expr("level_milli + h * trend_milli"))
      .select(col("key"), col("h"), col("n_days"), col("level_milli"),
        col("trend_milli"), col("sae_milli"), col("forecast_milli"))
      .orderBy("key", "h")
  }

  /** Stream hygiene audit — the per-key delivery-quality report an
    * ingestion pipeline checks BEFORE trusting event-time logic
    * downstream: in (event-time, sequence) order, how many adjacent
    * steps arrived OUT OF ORDER (sequence number decreased while time
    * advanced — late/reordered delivery), how many rows share an exact
    * duplicate instant (same microsecond — a collapsed-clock or
    * double-fire symptom, and exactly what makes a naive
    * `orderBy(ts)` nondeterministic), and the largest silent gap.
    * These are the three facts that decide watermark delay, dedup
    * policy, and tie-break columns; measuring them is one keyed
    * window pass.
    *
    * Output per key: `n_events`, `n_ooo_adj`, `n_dup_ts`,
    * `max_gap_sec` (NULL for single-event keys).
    */
  def streamHygiene(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      seqCol: Column
  ): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("us"), col("seq"))
    df.filter(keyCol.isNotNull && tsCol.isNotNull)
      .select(keyCol.as("key"), unix_micros(tsCol).as("us"), seqCol.as("seq"))
      .withColumn("__pus", lag(col("us"), 1).over(w))
      .withColumn("__pseq", lag(col("seq"), 1).over(w))
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__pseq").isNotNull && col("seq") < col("__pseq"), 1L)
          .otherwise(0L)).as("n_ooo_adj"),
        sum(when(col("__pus").isNotNull && col("us") === col("__pus"), 1L)
          .otherwise(0L)).as("n_dup_ts"),
        expr("max(us - __pus) DIV 1000000").as("max_gap_sec"))
  }

  /** Late-arrival accounting per key — how many rows would a
    * watermark of `delayMs` DROP, and how late was the worst one: a
    * row (in arrival order `seqCol`) is late iff its event time is
    * more than `delayMs` older than the max event time of all
    * PRECEDING arrivals — exactly the event-time-vs-high-watermark
    * test Structured Streaming applies, replayed retrospectively so
    * the delay can be TUNED from data instead of guessed. The
    * at-ingest twin is [[graft.streaming.StatefulOps.lateStream]]
    * (drained-parity pinned).
    *
    * Output per key: `n_events`, `n_late`, `max_late_ms` (NULL when
    * nothing was late). Scale: one shuffle on the key; the running
    * max is the usual sort-based window, no global window.
    */
  def lateArrivals(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      seqCol: Column,
      delayMs: Long
  ): DataFrame = {
    require(delayMs >= 0L, "delayMs must be non-negative")
    val prev = Window.partitionBy(col("key")).orderBy(col("seq"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.filter(keyCol.isNotNull && tsCol.isNotNull)
      .select(keyCol.as("key"), unix_micros(tsCol).as("us"), seqCol.as("seq"))
      .withColumn("__pm", max(col("us")).over(prev))
      .withColumn("__late",
        col("__pm").isNotNull && col("us") < col("__pm") - lit(delayMs * 1000L))
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__late"), 1L).otherwise(0L)).as("n_late"),
        expr("max(CASE WHEN __late THEN (__pm - us) DIV 1000 END)")
          .as("max_late_ms"))
  }

  /** Weekdays (Mon–Fri) in the half-open epoch-day interval `[a, b)` —
    * CLOSED FORM, no UDF, no calendar table, no per-day explode:
    * `g(d) = (d DIV 7)·5 + extra(d mod 7)` counts weekdays in `[0, d)`
    * (epoch day 0 = Thursday, so every partial week starts Thursday and
    * `extra` is the prefix-sum lookup [0,1,2,2,2,3,4,5]), and the
    * interval is `g(b) − g(a)`. Pure integer expression work — stays in
    * whole-stage codegen and reproduces bit-for-bit on any engine.
    * Defined for non-negative epoch days (post-1970).
    */
  def weekdaysBetween(startDay: Column, endDay: Column): Column = {
    val prefix = array(Seq(0, 1, 2, 2, 2, 3, 4, 5).map(v => lit(v.toLong)): _*)
    // (d - pmod)/7 divides exactly (the numerator is a multiple of 7),
    // so the double intermediate is integer-valued and cast-safe
    def g(d: Column): Column =
      ((d - pmod(d, lit(7L))) / lit(7L)).cast("long") * 5L +
        element_at(prefix, (pmod(d, lit(7L)) + 1L).cast("int"))
    g(endDay) - g(startDay)
  }

  /** One-sided (upward) CUSUM drift detection per key — Page's
    * cumulative-sum control chart: the recursive statistic
    * `s_i = max(0, s_{i−1} + (x_i − μ − k))` flags a PERSISTENT mean
    * shift that no single-point z-test ([[rollingAnomalies]]) sees.
    * Windows can't run a clamped recursion — but CUSUM has the exact
    * closed form `s_i = C_i − min(0, min_{j≤i} C_j)` over the plain
    * cumulative sum `C_i = Σ_{j≤i}(x_j − μ − k)`, which IS two stacked
    * window aggregates. That closed form is what keeps the operator
    * one-shuffle and oracle-expressible.
    *
    * Integer-exact without a divided mean: everything is scaled by the
    * per-key row count `n`, so the deviation term is
    * `n·x_i − Σx − k·n` (BIGINT, no floor bias to accumulate).
    * Emitted `cusum_nx` is the statistic ×n; the alarm compares against
    * `threshold·n` — same rational-comparison convention as
    * [[trendSlopes]]. Headroom: exact while
    * `n² · max|x − μ − k| < 2⁶³` — per-key series to ~10⁸ rows at
    * 10³-scale values; longer series should pre-aggregate to daily
    * cells first (the [[gapFillDaily]] composition).
    *
    * Rows with NULL key/ts/value are excluded; ties order on `seqCol`
    * (deterministic replay, the q73 µs-truncation lesson). Scale: ONE
    * shuffle — the per-key stats and both running windows share the
    * key partitioning.
    */
  /** [[cusumDrift]] against an EXPLICIT target level instead of the
    * per-key mean — the monitoring variant (the target comes from the
    * baseline/SLO, not from the data) and the batch twin of
    * `streaming.StatefulOps.cusumStream`, which cannot know a per-key
    * mean upfront. With a fixed target nothing needs the n-scaling:
    * `cusum` is in plain value units via the same closed form
    * `s_i = C_i − min(0, min_j C_j)` over `C_i = Σ(x_j − target −
    * slack)`, provably equal to Page's recursion
    * `max(0, s_{i−1} + d_i)` — which is exactly what the streaming twin
    * runs in state, so drained-stream ≡ batch row for row.
    */
  def cusumAt(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      valueCol: Column,
      seqCol: Column,
      target: Long,
      slack: Long,
      threshold: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ordered = Window.partitionBy(col("key"))
      .orderBy(col("ts_sec"), col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(keyCol.isNotNull && tsCol.isNotNull && valueCol.isNotNull)
      .select(keyCol.as("key"), unix_timestamp(tsCol).cast("long").as("ts_sec"),
        seqCol.cast("long").as("seq"), floor(valueCol).cast("long").as("x"))
      .withColumn("__c",
        sum(col("x") - lit(target) - lit(slack)).over(ordered))
      .withColumn("cusum",
        col("__c") - least(lit(0L), min(col("__c")).over(ordered)))
      .withColumn("is_drift", col("cusum") > lit(threshold))
      .select("key", "ts_sec", "seq", "x", "cusum", "is_drift")
  }

  def cusumDrift(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      valueCol: Column,
      seqCol: Column,
      slack: Long,
      threshold: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(col("key"))
    val ordered = byKey.orderBy(col("ts_sec"), col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(keyCol.isNotNull && tsCol.isNotNull && valueCol.isNotNull)
      .select(keyCol.as("key"), unix_timestamp(tsCol).cast("long").as("ts_sec"),
        seqCol.cast("long").as("seq"), floor(valueCol).cast("long").as("x"))
      .withColumn("__n", count(lit(1)).over(byKey))
      .withColumn("__sx", sum(col("x")).over(byKey))
      .withColumn("__c",
        sum(col("__n") * col("x") - col("__sx") - lit(slack) * col("__n"))
          .over(ordered))
      .withColumn("cusum_nx",
        col("__c") - least(lit(0L), min(col("__c")).over(ordered)))
      .withColumn("is_drift", col("cusum_nx") > lit(threshold) * col("__n"))
      .select(col("key"), col("ts_sec"), col("seq"), col("x"),
        col("cusum_nx"), col("__n").as("n"), col("is_drift"))
  }

  /** Per-key gap-filled daily count ARRAY — `(key, n_days, ys)` where
    * `ys[i]` is the count on the key's `i`-th calendar day (1-based,
    * zero-filled gaps). The shared front half of every
    * recurrence/series operator below ([[holtForecast]] predates the
    * factoring and keeps its inline copy). Scale shape: one
    * `groupBy(key, day)` count + one `groupBy(key)` collect; the array
    * is bounded by the key's calendar span (`maxDays` guard — a key
    * whose span exceeds it is DROPPED, the [[gapFillDaily]] contract,
    * never truncated into a silently-different series).
    */
  private def dailyCountSeries(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      maxDays: Int = 100000
  ): DataFrame =
    df.filter(keyCol.isNotNull && tsCol.isNotNull)
      .select(keyCol.as("key"), unix_timestamp(tsCol).cast("long").as("__ep"))
      .withColumn("day", expr("__ep DIV 86400"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("y"))
      .groupBy("key")
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"),
        map_from_entries(collect_list(struct(col("day"), col("y"))))
          .as("__m"))
      .filter(col("__d1") - col("__d0") < lit(maxDays.toLong))
      .withColumn("ys", expr(
        "transform(sequence(__d0, __d1)," +
          " d -> coalesce(__m[d], CAST(0 AS BIGINT)))"))
      .select(col("key"), size(col("ys")).cast("long").as("n_days"),
        col("ys"))

  /** Sample autocorrelation function in exact integer ppm: per key, the
    * gap-filled daily count series' ACF at lags `1..maxLag`,
    * `r_l = Σ_{t≤n-l} (y_t-ȳ)(y_{t+l}-ȳ) / Σ_t (y_t-ȳ)²` — the
    * seasonality/persistence fingerprint read before picking a forecast
    * model (a weekly cycle shows as a spike at lag 7). Exactness: work
    * with n-scaled centered values `c_t = n·y_t − S` (integers — no ȳ
    * division), so `r_l_ppm = (1e6·Σ c_t·c_{t+l}) DIV (Σ c_t²)`
    * bit-replays anywhere; products run in DECIMAL(38,0) lanes so a
    * 10-year key at 1e9 events/day cannot overflow (|c| ≤ n·max_y ≈
    * 4e12, c² ≈ 1.6e25, well inside 38 digits), output is BIGINT ppm.
    * NULL ppm for a constant series (zero variance); lags ≥ n_days are
    * not emitted.
    *
    * Scale shape: the [[dailyCountSeries]] shuffles plus per-row array
    * folds bounded by the calendar span — no join, no window, nothing
    * row²: the lag structure lives INSIDE each key's bounded array.
    */
  def acfPpm(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      maxLag: Int = 7
  ): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    dailyCountSeries(df, keyCol, tsCol)
      .withColumn("__s", expr("aggregate(ys, CAST(0 AS BIGINT), (a, y) -> a + y)"))
      .withColumn("__den", expr(
        """aggregate(ys, CAST(0 AS DECIMAL(38,0)),
          |  (a, y) -> a + (CAST(n_days AS DECIMAL(38,0)) * y - __s)
          |    * (CAST(n_days AS DECIMAL(38,0)) * y - __s))""".stripMargin))
      .select(col("key"), col("n_days"), col("ys"), col("__s"), col("__den"),
        explode(expr(s"sequence(1, $maxLag)")).as("lag"))
      .filter(col("lag") < col("n_days"))
      .withColumn("__num", expr(
        """aggregate(sequence(1, CAST(n_days - lag AS INT)),
          |  CAST(0 AS DECIMAL(38,0)),
          |  (a, i) -> a + (CAST(n_days AS DECIMAL(38,0)) * element_at(ys, i) - __s)
          |    * (CAST(n_days AS DECIMAL(38,0)) * element_at(ys, CAST(i + lag AS INT)) - __s))""".stripMargin))
      .withColumn("acf_ppm",
        when(col("__den") > 0,
          expr("CAST((__num * 1000000) DIV __den AS BIGINT)")))
      .select(col("key"), col("lag"), col("n_days"), col("acf_ppm"))
  }

  /** Additive Holt–Winters (triple exponential smoothing, Winters 1960)
    * over the gap-filled daily count series, season length `m`, in
    * exact integer milli lanes. Init from the first season: `l₀ =
    * (Σ_{i≤m} y_i·1000) DIV m`, `b₀ = 0`, `s_i = y_i·1000 − l₀`; then
    * for `t = m+1..n`
    * `l_t = (α(y_t·1000 − s_{t−m}) + (1e6−α)(l+b)) DIV 1e6`,
    * `b_t = (β(l_t − l) + (1e6−β)b) DIV 1e6`,
    * `s_t = (γ(y_t·1000 − l_t) + (1e6−γ)s_{t−m}) DIV 1e6` — every step
    * a truncating integer division, so the recurrence bit-replays in
    * any engine (float HW is run-order-sensitive; this is not).
    * Forecast `h` steps out adds the matching season slot:
    * `f_h = l + h·b + s_{(n+h−1) mod m}`. Keys with fewer than `m+1`
    * observed days are dropped (no season to fit), the documented
    * [[holtForecast]]-family contract.
    *
    * Scale shape: identical to [[holtForecast]] — two keyed shuffles,
    * then a per-row `aggregate` fold carrying `(l, b, s[m], sae)`;
    * state is O(m) per key and the fold is O(n_days), both
    * calendar-bounded.
    */
  def holtWintersForecast(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      m: Int = 7,
      horizon: Int = 7,
      alphaPpm: Long = 300000L,
      betaPpm: Long = 100000L,
      gammaPpm: Long = 200000L
  ): DataFrame = {
    require(m >= 2 && horizon >= 1, "m >= 2 and horizon >= 1")
    require(Seq(alphaPpm, betaPpm, gammaPpm)
      .forall(p => p > 0 && p <= 1000000L), "alpha/beta/gamma in (0, 1e6] ppm")
    val (a, b, g) = (alphaPpm, betaPpm, gammaPpm)
    // SQL lambdas cannot bind intermediates, so y_t and l_t are
    // INLINED wherever they appear (l_t three times: its own lane,
    // inside b_t, inside s_t); the oracle inlines the identical text,
    // so both engines compute the same integer ops
    val yT = "element_at(ys, t) * 1000"
    val sOld = s"element_at(acc.s, CAST((t - 1) % $m AS INT) + 1)"
    val lNew =
      s"(($a * ($yT - $sOld) + (1000000 - $a) * (acc.l + acc.b)) DIV 1000000)"
    dailyCountSeries(df, keyCol, tsCol)
      .filter(col("n_days") > lit(m.toLong))
      .withColumn("__l0", expr(
        s"aggregate(slice(ys, 1, $m), CAST(0 AS BIGINT), (a, y) -> a + y * 1000) DIV $m"))
      .withColumn("__st", expr(
        s"""aggregate(sequence($m + 1, CAST(n_days AS INT)),
           |  named_struct(
           |    'l', __l0, 'b', CAST(0 AS BIGINT),
           |    's', transform(slice(ys, 1, $m), y -> y * 1000 - __l0),
           |    'sae', CAST(0 AS BIGINT)),
           |  (acc, t) -> named_struct(
           |    'l', $lNew,
           |    'b', (($b * ($lNew - acc.l) + (1000000 - $b) * acc.b) DIV 1000000),
           |    's', transform(acc.s, (sv, j) ->
           |      IF(j = (t - 1) % $m,
           |        ($g * ($yT - $lNew) + (1000000 - $g) * sv) DIV 1000000,
           |        sv)),
           |    'sae', acc.sae + abs($yT - (acc.l + acc.b + $sOld))))""".stripMargin))
      .select(col("key"), col("n_days"),
        col("__st.l").as("level_milli"), col("__st.b").as("trend_milli"),
        col("__st.s").as("__s"), col("__st.sae").as("sae_milli"),
        explode(expr(s"sequence(1, $horizon)")).as("h"))
      .withColumn("season_milli",
        expr(s"element_at(__s, CAST((n_days + h - 1) % $m AS INT) + 1)"))
      .withColumn("forecast_milli",
        expr("level_milli + h * trend_milli + season_milli"))
      .select(col("key"), col("h"), col("n_days"), col("level_milli"),
        col("trend_milli"), col("season_milli"), col("sae_milli"),
        col("forecast_milli"))
  }

  /** Croston's method (Croston 1972) — the standard forecaster for
    * INTERMITTENT demand (series that are mostly zeros: rare-event
    * keys, long-tail SKUs), where plain exponential smoothing decays
    * to uselessness between demands. Maintains two EWMA lanes over the
    * gap-filled daily series: demand SIZE `z` (updated only on nonzero
    * days) and inter-demand INTERVAL `p` (the gap length, updated on
    * the same days); the per-period forecast is their ratio. First
    * demand initializes `z = y·1000`, `p = gap·1000`; later demands
    * fold `z' = (α·y·1000 + (1e6−α)z) DIV 1e6`,
    * `p' = (α·gap·1000 + (1e6−α)p) DIV 1e6` — all truncating integer
    * milli arithmetic, bit-replayable. Output per key: `n_days`,
    * `n_demand`, `z_milli`, `p_milli`, and
    * `forecast_milli = (z·1000) DIV p` (NULL when the key never
    * demanded). Keys with zero demand days still appear (their audit
    * row is the interesting one).
    *
    * Scale shape: the [[dailyCountSeries]] shuffles + an O(n_days)
    * per-row fold with O(1) state.
    */
  def crostonForecast(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      alphaPpm: Long = 200000L
  ): DataFrame = {
    require(alphaPpm > 0 && alphaPpm <= 1000000L, "alpha in (0, 1e6] ppm")
    val a = alphaPpm
    dailyCountSeries(df, keyCol, tsCol)
      .withColumn("__st", expr(
        s"""aggregate(ys,
           |  named_struct('z', CAST(0 AS BIGINT), 'p', CAST(0 AS BIGINT),
           |    'gap', CAST(1 AS BIGINT), 'nd', CAST(0 AS BIGINT)),
           |  (acc, y) -> IF(y > 0,
           |    named_struct(
           |      'z', IF(acc.nd = 0, y * 1000,
           |        ($a * y * 1000 + (1000000 - $a) * acc.z) DIV 1000000),
           |      'p', IF(acc.nd = 0, acc.gap * 1000,
           |        ($a * acc.gap * 1000 + (1000000 - $a) * acc.p) DIV 1000000),
           |      'gap', CAST(1 AS BIGINT), 'nd', acc.nd + 1),
           |    named_struct('z', acc.z, 'p', acc.p, 'gap', acc.gap + 1,
           |      'nd', acc.nd)))""".stripMargin))
      .select(col("key"), col("n_days"),
        col("__st.nd").as("n_demand"),
        when(col("__st.nd") > 0, col("__st.z")).as("z_milli"),
        when(col("__st.nd") > 0, col("__st.p")).as("p_milli"))
      .withColumn("forecast_milli",
        when(col("p_milli") > 0, expr("(z_milli * 1000) DIV p_milli")))
  }

  /** Classical additive seasonal decomposition (the moving-average
    * method, Persons 1919 — STL's deterministic ancestor):
    * `y = trend + seasonal + residual` over the gap-filled daily count
    * series. Trend is the centered m-day moving average in milli
    * (defined only where the full window exists — edges are NULL, not
    * extrapolated); the seasonal component of slot `s = (i−1) mod m`
    * is the truncating mean of all detrended values at that slot;
    * residual is what remains. All integer milli arithmetic with one
    * floor in the trend and one in the seasonal mean — bit-replayable.
    *
    * Scale shape: the [[dailyCountSeries]] shuffles, a posexplode back
    * to (key, day) grain, one m-bounded window per key (ROWS frame),
    * and a slot aggregate joined back — every step keyed, nothing
    * global.
    */
  def seasonalDecompose(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      m: Int = 7
  ): DataFrame = {
    require(m >= 2 && m % 2 == 1, s"m must be odd and >= 3: $m")
    val half = m / 2
    val days = dailyCountSeries(df, keyCol, tsCol)
      .select(col("key"), col("n_days"),
        posexplode(col("ys")).as(Seq("__i0", "y")))
      .select(col("key"), col("n_days"),
        (col("__i0") + 1).cast("long").as("i"), col("y"))
    val w = Window.partitionBy("key").orderBy("i")
      .rowsBetween(-half, half)
    val trended = days
      .withColumn("__wn", count(lit(1)).over(w))
      .withColumn("__wsum", sum(col("y") * 1000L).over(w))
      .withColumn("trend_milli",
        when(col("__wn") === m, expr(s"__wsum DIV $m")))
      .withColumn("__detr", col("y") * 1000L - col("trend_milli"))
      .withColumn("slot", expr(s"CAST((i - 1) % $m AS BIGINT)"))
    val seasonal = trended.filter(col("__detr").isNotNull)
      .groupBy("key", "slot")
      .agg(expr("CAST(sum(__detr) DIV count(*) AS BIGINT)").as("seasonal_milli"))
    trended.join(seasonal, Seq("key", "slot"), "left")
      .withColumn("residual_milli",
        col("y") * 1000L - col("trend_milli") - col("seasonal_milli"))
      .select(col("key"), col("i"), col("slot"), col("y"),
        col("trend_milli"), col("seasonal_milli"), col("residual_milli"))
  }

  /** Cross-correlation function between every PAIR of keys' daily
    * count series in signed ppm — the lead-lag detector ("does an
    * error spike precede a purchase dip?"): for keys a < b and lag
    * `l ∈ [−maxLag, maxLag]`, the Pearson correlation between `a(d)`
    * and `b(d + l)` over the days where both series are defined
    * (each gap-filled over its own span). No sqrt: the
    * [[graft.ops.Stats.spearman]] signed-r² decomposition
    * `r²_signed_ppm = sign(cov)·(cov²·1e6) DIV (vx·vy)` with
    * n-scaled centered sums over the OVERLAP sample, DECIMAL(38,0)
    * lanes. NULL when either side is constant on the overlap; pairs
    * emitted once under `key_a < key_b`.
    *
    * Scale shape: the day grain is calendar-bounded, and the pair
    * grid is key²-bounded (metric families, not entities) — the
    * overlap join is (pair, lag, day) rows ≤ |keys|²·(2L+1)·days,
    * configuration-sized at any corpus scale.
    */
  def crossCorrPpm(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      maxLag: Int = 7
  ): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0: $maxLag")
    val d38 = "DECIMAL(38,0)"
    // absolute-day alignment via gapFillDaily (each key zero-filled over
    // its own span); checkpointed — it feeds both sides of the pair join
    val daily = gapFillDaily(
        df.filter(keyCol.isNotNull && tsCol.isNotNull), keyCol, tsCol)
      .select(col("key"), expr("day_sec DIV 86400").as("day"),
        col("n_events").as("y"))
      .localCheckpoint(false)
    val a = daily.select(col("key").as("key_a"), col("day"),
        col("y").as("ya"))
      .crossJoin(broadcast(
        daily.sparkSession.range(-maxLag.toLong, maxLag + 1L)
          .select(col("id").as("lag"))))
    val b = daily.select(col("key").as("key_b"), col("day").as("__db"),
      col("y").as("yb"))
    val agg = a.join(b,
        col("key_a") < col("key_b") && col("__db") === col("day") + col("lag"))
      .groupBy("key_a", "key_b", "lag")
      .agg(count(lit(1)).as("n"),
        sum(expr(s"CAST(ya AS $d38)")).as("sa"),
        sum(expr(s"CAST(yb AS $d38)")).as("sb"),
        sum(expr(s"CAST(ya AS $d38) * ya")).as("saa"),
        sum(expr(s"CAST(yb AS $d38) * yb")).as("sbb"),
        sum(expr(s"CAST(ya AS $d38) * yb")).as("sab"),
        max(col("ya")).as("__ma"), max(col("yb")).as("__mb"))
    agg
      .withColumn("__cov", expr("n * sab - sa * sb"))
      .withColumn("__vx", expr("n * saa - sa * sa"))
      .withColumn("__vy", expr("n * sbb - sb * sb"))
      // exactness guard (the spearman convention): cov <= n^2*ma*mb must
      // stay <= 3e17 so cov^2*1000 fits DECIMAL(38,0); pre-scale the
      // series beyond (any calendar-bounded count series is far inside)
      .withColumn("__ok", expr(
        s"CAST(n AS $d38) * n * __ma * __mb <= CAST(300000000000000000 AS $d38)"))
      .withColumn("r2_signed_ppm",
        when(col("__ok") && col("__vx") > 0 && col("__vy") > 0, expr(
          """CAST((CASE WHEN __cov < 0 THEN -1 ELSE 1 END)
            |  * (((__cov * __cov * 1000) DIV (__vx * __vy)) * 1000
            |     + (((__cov * __cov * 1000) % (__vx * __vy)) * 1000)
            |       DIV (__vx * __vy)) AS BIGINT)""".stripMargin)))
      .select(col("key_a"), col("key_b"), col("lag"),
        col("n").as("n_overlap"), col("r2_signed_ppm"))
  }

  /** Exponentially-decayed popularity — "what is trending NOW": each
    * event contributes `1e6 DIV 2^min(age DIV halfLifeDays, 19)` ppm of
    * weight relative to the corpus' LATEST day (the
    * `Behavior.timeDecayAttribution` bit-shift convention: halvings,
    * never `pow`, capped so weight never floors to zero), so yesterday
    * outweighs last month without a hard cutoff window. Output per
    * key: `n_events`, `last_day_age` (freshness), `decayed_ppm` — the
    * ranking signal.
    *
    * Scale shape: ONE hash aggregate keyed on the key after a map-side
    * weight projection; the one-row max-day anchor is broadcast (the
    * q178 recency-anchor shape).
    */
  def decayedPopularity(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      halfLifeDays: Int = 7
  ): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1: $halfLifeDays")
    val days = df.filter(keyCol.isNotNull && tsCol.isNotNull)
      .select(keyCol.as("key"),
        unix_timestamp(tsCol).cast("long").as("__ep"))
      .withColumn("day", expr("__ep DIV 86400"))
      .drop("__ep")
    val anchor = days.agg(max(col("day")).as("__maxd"))
    days.crossJoin(broadcast(anchor))
      .withColumn("__age", col("__maxd") - col("day"))
      .withColumn("__w", expr(
        s"CAST(1000000 DIV shiftleft(CAST(1 AS BIGINT)," +
          s" CAST(least(__age DIV $halfLifeDays, 19) AS INT)) AS BIGINT)"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"),
        min(col("__age")).as("last_day_age"),
        sum(col("__w")).as("decayed_ppm"))
  }

  /** Mann–Kendall trend test (Mann 1945; Kendall 1975) on the
    * gap-filled daily count series — the standard nonparametric "is
    * this metric trending" monitor (no distribution or linearity
    * assumption; robust to the outliers that wreck an OLS slope).
    * `S = Σ_{i<j} sign(y_j − y_i)`; the tie-corrected variance is
    * `Var·18 = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)` — kept ×18 so it
    * stays integer — and the continuity-corrected z² clears in exact
    * integers: `significant ⟺ 180000·(|S|−1)² > 38416·var18` (both
    * sides = 10⁴·18·z²·var18 with z_crit² = 1.96² = 3.8416, the
    * [[ops.Stats]] cleared-test convention). Also emits
    * `z2_signed_milli = sign(S)·(18000·(|S|−1)²) DIV var18`.
    *
    * Scale shape: the series is calendar-bounded, so the O(n²) pair
    * fold runs INSIDE each key's array — no join, nothing row². S and
    * the tie term are exact integers; var18 fits BIGINT to n ≈ 10⁶
    * days (≫ any calendar), and since |S| reaches n(n−1)/2 the
    * (|S|−1)² products run in DECIMAL(38,0) lanes (|S| ≈ 5·10⁹ at the
    * [[dailyCountSeries]] maxDays bound squares past BIGINT; the
    * oracle's HUGEINT lanes replay them — same values, no silent
    * non-ANSI wrap on one side only).
    */
  /** Trend/seasonal STRENGTH features (Wang, Smith & Hyndman 2006; the
    * `feasts`/tsfeatures measures) read off the [[seasonalDecompose]]
    * components in exact integer ppm — the model-selection readout
    * ("is this series worth a seasonal model, a trend model, or
    * neither?") that turns the decomposition into two comparable
    * numbers per key:
    * `strength_trend = max(0, 1 − Var(resid)/Var(trend + resid))`,
    * `strength_seasonal = max(0, 1 − Var(resid)/Var(seasonal + resid))`
    * — both over the FULL-WINDOW rows only (the decomposition's NULL
    * edges carry no components). Variances compare as n-scaled sums of
    * squares (`n·Σx² − (Σx)²` — same n both sides, so the common
    * factor cancels), one truncating DIV per strength, DECIMAL(38,0)
    * lanes (milli components square past BIGINT for large daily
    * counts). NULL when the denominator variance is 0 (a flat
    * deseasoned/detrended series — the ratio is undefined, not 0 or
    * 1); the clamp at 0 mirrors the published definition.
    *
    * Scale shape: [[seasonalDecompose]]'s keyed shuffles + ONE more
    * key-grain hash aggregate — nothing new beyond the decomposition
    * it reads.
    */
  def seasonalStrength(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      m: Int = 7
  ): DataFrame = {
    val d38 = "DECIMAL(38,0)"
    seasonalDecompose(df, keyCol, tsCol, m)
      .filter(col("residual_milli").isNotNull)
      .select(col("key"),
        col("residual_milli").as("__r"),
        (col("y") * 1000L - col("trend_milli")).as("__dt"),
        (col("y") * 1000L - col("seasonal_milli")).as("__ds"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"),
        sum(expr(s"CAST(__r AS $d38)")).as("__sr"),
        sum(expr(s"CAST(__r AS $d38) * __r")).as("__qr"),
        sum(expr(s"CAST(__dt AS $d38)")).as("__sdt"),
        sum(expr(s"CAST(__dt AS $d38) * __dt")).as("__qdt"),
        sum(expr(s"CAST(__ds AS $d38)")).as("__sds"),
        sum(expr(s"CAST(__ds AS $d38) * __ds")).as("__qds"))
      .withColumn("__vr", expr("n * __qr - __sr * __sr"))
      .withColumn("__vdt", expr("n * __qdt - __sdt * __sdt"))
      .withColumn("__vds", expr("n * __qds - __sds * __sds"))
      .withColumn("strength_trend_ppm",
        when(col("__vds") > 0, expr(
          """greatest(CAST(1000000 AS BIGINT)
            |  - CAST((__vr * 1000000) DIV __vds AS BIGINT),
            |  CAST(0 AS BIGINT))""".stripMargin)))
      .withColumn("strength_seasonal_ppm",
        when(col("__vdt") > 0, expr(
          """greatest(CAST(1000000 AS BIGINT)
            |  - CAST((__vr * 1000000) DIV __vdt AS BIGINT),
            |  CAST(0 AS BIGINT))""".stripMargin)))
      .select(col("key"), col("n"), col("strength_trend_ppm"),
        col("strength_seasonal_ppm"))
  }

  /** Wald–Wolfowitz runs test (1940) on the gap-filled daily count
    * series: are above-median and below-median days RANDOMLY
    * interleaved, or do they cluster (trend/regime persistence — fewer
    * runs than chance) or alternate (oscillation — more)? Days equal
    * to the LOWER median are dropped (the classical dichotomization);
    * with `n₁`/`n₂` days above/below, `N = n₁+n₂`, `A = 2n₁n₂` and `R`
    * runs, the z² clears in exact integers — from
    * `E[R] = 1 + A/N` and `Var = A(A−N)/(N²(N−1))`, multiplying
    * through by N²(N−1): with `d = R·N − N − A`,
    * `significant ⟺ 10000·d²·(N−1) > 38416·A·(A−N)` and
    * `z2_signed_milli = sign(d)·(1000·d²·(N−1)) DIV (A·(A−N))` (sign
    * +: more runs than expected = anti-persistence; −: clustering).
    * d² runs in DECIMAL(38,0) lanes (|d| ≤ N²; the [[mannKendall]]
    * overflow lesson applied from day one). NULL when every kept day
    * is on one side (A·(A−N) = 0 — the statistic is undefined).
    *
    * Scale shape: the [[dailyCountSeries]] shuffles + O(span) array
    * folds — the lag structure lives inside each key's bounded array.
    */
  def runsTest(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column
  ): DataFrame =
    dailyCountSeries(df, keyCol, tsCol)
      .withColumn("__med", expr(
        "element_at(array_sort(ys), CAST((n_days + 1) DIV 2 AS INT))"))
      .withColumn("__signs", expr(
        """filter(transform(ys, y -> CASE WHEN y > __med THEN 1
          |  WHEN y < __med THEN -1 ELSE 0 END), s -> s != 0)""".stripMargin))
      .withColumn("n_above",
        expr("CAST(size(filter(__signs, s -> s = 1)) AS BIGINT)"))
      .withColumn("n_below",
        expr("CAST(size(filter(__signs, s -> s = -1)) AS BIGINT)"))
      .withColumn("runs", expr(
        """CASE WHEN size(__signs) <= 1 THEN CAST(size(__signs) AS BIGINT)
          |  ELSE 1 + CAST(size(filter(sequence(2, size(__signs)),
          |    i -> element_at(__signs, i)
          |      != element_at(__signs, CAST(i - 1 AS INT)))) AS BIGINT)
          |END""".stripMargin))
      .withColumn("__nn", col("n_above") + col("n_below"))
      .withColumn("__a", expr("2 * n_above * n_below"))
      .withColumn("__d", expr("runs * __nn - __nn - __a"))
      .withColumn("z2_signed_milli",
        when(expr("CAST(__a AS DECIMAL(38,0)) * (__a - __nn) > 0"), expr(
          """CAST(sign(__d) AS BIGINT)
            |  * CAST((1000 * CAST(abs(__d) AS DECIMAL(38,0)) * abs(__d)
            |          * (__nn - 1))
            |      DIV (CAST(__a AS DECIMAL(38,0)) * (__a - __nn))
            |      AS BIGINT)""".stripMargin)))
      .withColumn("significant",
        coalesce(expr(
          """CAST(__a AS DECIMAL(38,0)) * (__a - __nn) > 0
            |  AND 10000 * CAST(abs(__d) AS DECIMAL(38,0)) * abs(__d)
            |      * (__nn - 1)
            |    > 38416 * CAST(__a AS DECIMAL(38,0)) * (__a - __nn)""".stripMargin),
          lit(false)))
      .select(col("key"), col("n_days"), col("n_above"), col("n_below"),
        col("runs"), col("z2_signed_milli"), col("significant"))

  def mannKendall(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column
  ): DataFrame =
    dailyCountSeries(df, keyCol, tsCol)
      .filter(col("n_days") >= 2)
      .withColumn("s_stat", expr(
        """aggregate(sequence(1, CAST(n_days - 1 AS INT)), CAST(0 AS BIGINT),
          |  (a, i) -> a + aggregate(
          |    sequence(CAST(i + 1 AS INT), CAST(n_days AS INT)),
          |    CAST(0 AS BIGINT),
          |    (b, j) -> b + CAST(sign(element_at(ys, j) - element_at(ys, i)) AS BIGINT)))""".stripMargin))
      .withColumn("__ties", expr(
        """aggregate(array_distinct(ys), CAST(0 AS BIGINT),
          |  (a, v) -> a
          |    + CAST(size(filter(ys, x -> x = v)) AS BIGINT)
          |      * (CAST(size(filter(ys, x -> x = v)) AS BIGINT) - 1)
          |      * (2 * CAST(size(filter(ys, x -> x = v)) AS BIGINT) + 5))""".stripMargin))
      .withColumn("var18", expr(
        "n_days * (n_days - 1) * (2 * n_days + 5) - __ties"))
      .withColumn("z2_signed_milli",
        when(col("var18") > 0, expr(
          """CAST(sign(s_stat) AS BIGINT)
            |  * CAST((18000 * CAST(abs(s_stat) - 1 AS DECIMAL(38,0))
            |          * (abs(s_stat) - 1)) DIV var18 AS BIGINT)""".stripMargin)))
      .withColumn("significant",
        coalesce(expr(
          """var18 > 0 AND abs(s_stat) > 1
            |  AND 180000 * CAST(abs(s_stat) - 1 AS DECIMAL(38,0)) * (abs(s_stat) - 1)
            |      > 38416 * CAST(var18 AS DECIMAL(38,0))""".stripMargin),
          lit(false)))
      .select(col("key"), col("n_days"), col("s_stat"), col("var18"),
        col("z2_signed_milli"), col("significant"))
}
