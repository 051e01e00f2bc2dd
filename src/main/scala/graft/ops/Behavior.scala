package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics over an append-only interaction log — the
  * warehouse workloads (slowly-changing dimensions, funnel conversion,
  * cohort retention) that turn the reference's raw telemetry stream
  * (`PythonKafkaSink/main.py:13-18`) into longitudinal facts. All three
  * operators shuffle exactly once, on the entity key — at 100 TB the
  * event log is naturally bucketed by that key, so every shape below
  * co-locates and the window/agg phases run shuffle-free.
  */
object Behavior {

  /** Slowly-changing-dimension Type 2 build: collapse an ordered change
    * log into validity intervals per key. Rows whose tracked attribute
    * equals the previous row's (per key, ordered by `tsCol` then
    * `seqCol` for determinism under equal timestamps) are change-log
    * noise and collapse away; each surviving row opens an interval
    * `[valid_from, valid_to)` closed by the NEXT surviving change, with
    * the latest interval open (`valid_to` NULL, `is_current` true).
    *
    * Output: `(key, attr, valid_from, valid_to, is_current)`.
    *
    * Scale shape: one shuffle on the key; both windows (the lag-based
    * change collapse and the lead-based interval close) share the same
    * partitioning and ordering, so Catalyst plans a single sort + two
    * window phases over it — no second exchange. Key cardinality bounds
    * partition size (an entity's history, not the corpus).
    */
  def scdType2(
      changes: DataFrame,
      keyCol: Column,
      tsCol: Column,
      attrCol: Column,
      seqCol: Column
  ): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("seq"))
    val collapsed = changes
      .select(keyCol.as("key"), tsCol.as("ts"), attrCol.as("attr"), seqCol.as("seq"))
      .withColumn("__prev", lag(col("attr"), 1).over(w))
      // null-safe: first row per key has __prev NULL and must survive
      // even when attr is NULL too — presence, not value, opens it
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !(col("attr") <=> col("__prev")))
    collapsed
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("key"), col("attr"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  /** Incremental SCD2 merge: apply a NEW batch of change events to an
    * already-built [[scdType2]] dimension without rebuilding history —
    * the production upsert that keeps a 100 TB dimension current from
    * daily/hourly deltas. Closed intervals pass through untouched; each
    * touched key's OPEN row is re-seeded as a pseudo-event at its
    * `valid_from` and merged with the key's new events through the SAME
    * collapse/close windows as the full build, so a batch value equal
    * to the current open value collapses away (run start preserved), a
    * distinct value closes the open row at its timestamp, and brand-new
    * keys build from scratch. By construction
    * `scd2Apply(scdType2(log ≤ T), log > T) ≡ scdType2(log)` — the
    * invariant `q144` hash-gates against the full-rebuild oracle.
    *
    * CONTRACT: the batch must lie beyond each key's open-row
    * `valid_from` (the incremental high-water mark). A violating event
    * would silently rewrite history, so it RAISES instead (checked with
    * a partition-only window over the merge's own key partitioning —
    * no extra shuffle).
    *
    * Scale shape: one shuffle over (open rows of touched keys ∪ batch),
    * i.e. O(delta + live keys), never O(history); the closed-row
    * pass-through is a scan-union with no shuffle at all.
    */
  def scd2Apply(
      current: DataFrame,
      changes: DataFrame,
      keyCol: Column,
      tsCol: Column,
      attrCol: Column,
      seqCol: Column
  ): DataFrame = {
    val cur = current.select(col("key"), col("attr"), col("valid_from"),
      col("valid_to"), col("is_current"))
    // the seed flag is an OUT-OF-BAND marker column, not a sentinel seq
    // value: a batch row whose seqCol happens to equal any reserved long
    // must still be treated (and checked) as a batch event
    val seeds = cur.filter(col("is_current"))
      .select(col("key"), col("valid_from").as("ts"), col("attr"),
        lit(0L).as("seq"), lit(true).as("__seed"))
    val batch = changes
      .select(keyCol.as("key"), tsCol.as("ts"), attrCol.as("attr"),
        seqCol.as("seq"), lit(false).as("__seed"))
    val seeded = seeds.unionByName(batch)
    // high-water-mark check: a batch event at or before its key's seed
    // ts would rewrite closed history (seed ordering ties are impossible
    // for the same reason). Same key partitioning as scdType2's windows,
    // so Catalyst reuses the exchange.
    val seedTs = min(when(col("__seed"), col("ts")))
      .over(Window.partitionBy(col("key")))
    val checked = seeded.withColumn("ts",
      when(!col("__seed") && col("ts") <= seedTs,
        raise_error(concat(lit("scd2Apply: batch event at "),
          col("ts").cast("string"),
          lit(" is not beyond the open row of key "),
          col("key").cast("string"))).cast(seeded.schema("ts").dataType))
        .otherwise(col("ts")))
    cur.filter(!col("is_current"))
      .unionByName(scdType2(checked, col("key"), col("ts"), col("attr"), col("seq")))
  }

  /** Fact-to-dimension temporal enrichment — the classic warehouse
    * lookup: attach to each fact row the SCD2 attribute whose validity
    * interval covers the fact's timestamp (`valid_from <= ts <
    * valid_to`, open intervals included; facts before the key's first
    * interval get NULL). `dim` is a [[scdType2]]/[[scd2Apply]] output.
    *
    * Implemented as [[AsOfJoin.backward]] on `valid_from` — legal
    * because SCD2 intervals are CONTIGUOUS per key, so the latest
    * interval starting at or before `ts` is exactly the covering one;
    * no range join, one shuffle on the key. EMPTY intervals
    * (`valid_to == valid_from`, produced by equal-timestamp change
    * pairs) are dropped first: they cover no instant, and keeping them
    * would put two dimension rows at one (key, valid_from) — an
    * as-of tie the join contract forbids.
    */
  def enrichAsOf(
      facts: DataFrame,
      dim: DataFrame,
      factKeyCol: String,
      factTsCol: String,
      attrName: String = "attr"
  ): DataFrame = {
    val iv = dim
      .filter(col("valid_to").isNull || col("valid_to") > col("valid_from"))
      .select(col("key"), col("attr"), col("valid_from"))
    AsOfJoin.backward(facts, iv, factKeyCol, "key", factTsCol, "valid_from")
      .select(facts.columns.map(col).toSeq :+ col("asof.attr").as(attrName): _*)
  }

  /** Point-in-time reconstruction ("state as of T") from the change
    * log — the time-travel read over [[scdType2]]'s intervals: the one
    * interval per key covering `asOf` (`valid_from <= T < valid_to`,
    * open intervals included). Keys whose first change is after `T`
    * are absent, exactly as they were absent from the dimension then.
    * `valid_from` is the START of the value's run (repeat-collapsed),
    * not the latest pre-T event — the SCD2 semantics downstream
    * history joins expect.
    *
    * Scale shape: inherits scdType2's single shuffle; the `asOf`
    * filter lands above the windows (it needs both interval
    * endpoints), so cost is one dimension build — at 100 TB serve
    * repeated time-travel reads from a MATERIALIZED scdType2 table
    * instead, where this becomes a metadata-pruned scan.
    */
  def snapshotAt(
      changes: DataFrame,
      keyCol: Column,
      tsCol: Column,
      attrCol: Column,
      seqCol: Column,
      asOf: Column
  ): DataFrame =
    scdType2(changes, keyCol, tsCol, attrCol, seqCol)
      .filter(col("valid_from") <= asOf &&
        (col("valid_to").isNull || col("valid_to") > asOf))
      .select(col("key"), col("attr"), col("valid_from"))

  /** Ordered-sequence funnel: for each user, the earliest time of each
    * stage STRICTLY AFTER the previous stage's chosen time (the
    * standard "first conversion path", not any-order co-occurrence).
    * Returns one row per user that reached stage 1, with one nullable
    * timestamp column per stage (named `t1..tN` in stage order) and
    * `depth` = number of stages reached.
    *
    * Scale shape: stage k is a filtered min-aggregate on the user key
    * joined back to the stage-(k-1) frontier — every shuffle is on the
    * same key, so with AQE (or bucketing on user) the exchanges reuse
    * one partitioning; the frontier shrinks monotonically, and each
    * events pass is pre-filtered to ONE stage's type before the
    * shuffle, so map-side partial aggregation sees only that slice.
    */
  def funnel(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      stages: Seq[String]
  ): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = events.select(userCol.as("user"), tsCol.as("ts"), typeCol.as("et"))
    val first = base.filter(col("et") === stages.head)
      .groupBy("user").agg(min("ts").as("t1"))
    val full = stages.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (stage, i)) =>
        val prev = s"t$i"
        val cur = s"t${i + 1}"
        val next = base.filter(col("et") === stage)
          .join(acc.select(col("user"), col(prev)), Seq("user"))
          .filter(col("ts") > col(prev))
          .groupBy("user").agg(min("ts").as(cur))
          .select(col("user"), col(cur))
        acc.join(next, Seq("user"), "left")
    }
    val depth = stages.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    full.withColumn("depth", depth)
  }

  /** Last-touch attribution: each conversion event is credited to the
    * LATEST preceding touch event (same user, touch time ≤ conversion
    * time) within `windowSec` — the standard marketing-attribution
    * join, and the canonical application of the as-of machinery
    * ([[AsOfJoin.backward]] does the heavy lifting; this adds the
    * event-type split, the per-(user, time) touch dedup the as-of
    * contract requires, and the lookback window). Touches outside the
    * window attribute NULL (an "organic" conversion).
    *
    * Output: one row per conversion — `(user, conv_time, touch_time
    * NULLABLE, attributed BOOLEAN)`.
    *
    * Scale shape: inherits the as-of join's single shuffle on the user
    * key; the type filters prune both sides before it.
    */
  def lastTouchAttribution(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      touchType: String,
      convType: String,
      windowSec: Long
  ): DataFrame = {
    val base = events.select(userCol.as("user"), tsCol.as("ts"), typeCol.as("et"))
    val convs = base.filter(col("et") === convType)
      .select(col("user"), col("ts").as("conv_time"))
    // the as-of uniqueness contract is satisfied WITHOUT a dedup
    // shuffle: the touch side carries only (user, touch_time), so
    // duplicate instants are byte-identical rows and the as-of's
    // last() picks the same struct whichever copy wins
    val touches = base.filter(col("et") === touchType)
      .select(col("user"), col("ts").as("touch_time"))
    AsOfJoin.backward(convs, touches,
        leftKey = "user", rightKey = "user",
        leftTime = "conv_time", rightTime = "touch_time")
      .withColumn("touch_time",
        when(col("asof").isNotNull &&
            unix_micros(col("conv_time")) - unix_micros(col("asof.touch_time"))
              <= windowSec * 1000000L,
          col("asof.touch_time")))
      .withColumn("attributed", col("touch_time").isNotNull)
      .select(col("user"), col("conv_time"), col("touch_time"), col("attributed"))
  }

  /** Multi-touch LINEAR attribution with EXACT credit conservation —
    * each conversion's 10⁶ ppm of credit splits evenly across every
    * touch in its lookback window via the largest-remainder method:
    * every touch gets `10⁶ DIV k`, and the `10⁶ mod k` leftover ppm go
    * one each to the most RECENT touches (recency-desc, then touch id —
    * total order). Credits therefore sum to EXACTLY `10⁶ ·
    * n_conversions` across the whole report — integer division never
    * leaks or mints credit, the property a revenue-allocation report is
    * audited against (and the one naive `1/k` doubles cannot give).
    * Conversions with NO touch in the window credit a `__direct__`
    * channel in full, closing the conservation identity.
    *
    * Output per channel: `n_touches` (credited touch rows; for
    * `__direct__`, the untouched conversions) and `credit_ppm` (its
    * exact share of `10⁶ × n_conversions`).
    *
    * Scale: the touch build is a per-user equi-join with a time-range
    * filter (bounded by per-user activity in the window); the
    * per-conversion k/rank are one window over the conversion id. Two
    * key shuffles, no global state.
    */
  def linearAttribution(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      idCol: Column,
      convType: String,
      windowSec: Long
  ): DataFrame = {
    // NULL ids excluded for the same reason as [[timeDecayAttribution]]:
    // they merge partitions here but NULL-poison the oracle's NOT IN.
    val base = events
      .filter(userCol.isNotNull && tsCol.isNotNull && typeCol.isNotNull &&
        idCol.isNotNull)
      .select(userCol.as("user"), unix_timestamp(tsCol).cast("long").as("sec"),
        typeCol.as("et"), idCol.as("eid"))
    val convs = base.filter(col("et") === convType)
      .select(col("user"), col("sec").as("conv_sec"), col("eid").as("conv_id"))
    val touches = base.filter(col("et") =!= convType)
      .select(col("user"), col("sec").as("touch_sec"),
        col("et").as("channel"), col("eid").as("touch_id"))
    val joined = convs.join(touches, Seq("user"))
      .filter(col("touch_sec") >= col("conv_sec") - windowSec &&
        col("touch_sec") < col("conv_sec"))
    val wk = Window.partitionBy(col("conv_id"))
    val wr = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_sec").desc, col("touch_id"))
    val credited = joined
      .withColumn("__k", count(lit(1)).over(wk))
      .withColumn("__rn", row_number().over(wr))
      .withColumn("credit",
        expr("1000000 DIV __k") +
          when(col("__rn") <= expr("pmod(1000000, __k)"), 1L).otherwise(0L))
    val byChannel = credited.groupBy("channel")
      .agg(count(lit(1)).as("n_touches"), sum(col("credit")).as("credit_ppm"))
    val direct = convs
      .join(credited.select(col("conv_id")).distinct(), Seq("conv_id"),
        "left_anti")
      .agg(count(lit(1)).as("n_touches"))
      .filter(col("n_touches") > 0)
      .select(lit("__direct__").as("channel"), col("n_touches"),
        (col("n_touches") * 1000000L).as("credit_ppm"))
    byChannel.unionByName(direct)
  }

  /** Time-decay multi-touch attribution — the third standard model
    * next to [[lastTouchAttribution]] and [[linearAttribution]]:
    * each touch inside the lookback window earns weight
    * `10⁶ DIV 2^(age DIV halfLifeSec)` (integer halvings via bit
    * shift, capped at 2⁻¹⁹ so the weight never floors to zero — no
    * floating `pow` anywhere), and each
    * conversion's 10⁶ ppm of credit splits proportionally with
    * LARGEST-REMAINDER rounding (`credit = ⌊10⁶·w/Σw⌋` + 1 for the
    * touches with the largest remainders, ties to the most recent) —
    * so per-conversion credit conserves EXACTLY 10⁶, the
    * [[linearAttribution]] q248 contract, and the whole model replays
    * bit for bit.
    *
    * Touchless conversions aggregate under `__direct__` with full
    * credit. Scale: one user-keyed join + per-conversion windows —
    * [[linearAttribution]]'s profile.
    */
  def timeDecayAttribution(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      idCol: Column,
      convType: String,
      windowSec: Long,
      halfLifeSec: Long
  ): DataFrame = {
    require(windowSec > 0 && halfLifeSec > 0,
      "window and half-life must be positive")
    // idCol participates in per-conversion partitioning AND the
    // oracle's NOT-IN anti-join: a NULL id would merge conversions on
    // the Spark side while NULL-poisoning the SQL side — exclude it
    // up front so both engines agree by construction.
    val base = events
      .filter(userCol.isNotNull && tsCol.isNotNull && typeCol.isNotNull &&
        idCol.isNotNull)
      .select(userCol.as("user"), unix_timestamp(tsCol).cast("long").as("sec"),
        typeCol.as("et"), idCol.as("eid"))
    val convs = base.filter(col("et") === convType)
      .select(col("user"), col("sec").as("conv_sec"), col("eid").as("conv_id"))
    val touches = base.filter(col("et") =!= convType)
      .select(col("user"), col("sec").as("touch_sec"),
        col("et").as("channel"), col("eid").as("touch_id"))
    val joined = convs.join(touches, Seq("user"))
      .filter(col("touch_sec") >= col("conv_sec") - windowSec &&
        col("touch_sec") < col("conv_sec"))
    val wk = Window.partitionBy(col("conv_id"))
    val credited = joined
      .withColumn("__h", least(
        expr(s"(conv_sec - touch_sec) DIV $halfLifeSec"), lit(19L)))
      .withColumn("__w", expr(
        "1000000 DIV shiftleft(CAST(1 AS BIGINT), CAST(__h AS INT))"))
      .withColumn("__sw", sum(col("__w")).over(wk))
      .withColumn("__q", expr("(1000000 * __w) DIV __sw"))
      .withColumn("__r", expr("(1000000 * __w) % __sw"))
      .withColumn("__left", lit(1000000L) - sum(col("__q")).over(wk))
      .withColumn("__rn", row_number().over(Window.partitionBy(col("conv_id"))
        .orderBy(col("__r").desc, col("touch_sec").desc, col("touch_id"))))
      .withColumn("credit",
        col("__q") + when(col("__rn") <= col("__left"), 1L).otherwise(0L))
    val byChannel = credited.groupBy("channel")
      .agg(count(lit(1)).as("n_touches"), sum(col("credit")).as("credit_ppm"))
    val direct = convs
      .join(credited.select(col("conv_id")).distinct(), Seq("conv_id"),
        "left_anti")
      .agg(count(lit(1)).as("n_touches"))
      .filter(col("n_touches") > 0)
      .select(lit("__direct__").as("channel"), col("n_touches"),
        (col("n_touches") * 1000000L).as("credit_ppm"))
    byChannel.unionByName(direct)
  }

  /** Session path mining — the "how do sessions start" report: events
    * sessionize by inactivity gap (gaps-and-islands, the q91 shape),
    * each session contributes its first `depth` event types joined as
    * `a>b>c` (shorter sessions contribute their shorter prefix —
    * concat_ws drops the missing arms), and paths roll up with exact
    * ppm shares of ALL sessions. The path table is bounded by
    * |types|^depth, so the share denominator is a global window over a
    * bounded intermediate (the documented benign class), not a scan.
    *
    * Determinism: in-session order is (event time, event id) — total.
    * Scale: the sessionize windows and the prefix rank share one user
    * shuffle; everything after runs on the bounded path table.
    */
  def sessionPaths(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      idCol: Column,
      gapSec: Long,
      depth: Int
  ): DataFrame = {
    require(gapSec > 0 && depth >= 1 && depth <= 8,
      "need gapSec > 0 and depth in 1..8")
    val w = Window.partitionBy(col("user"))
      .orderBy(col("us"), col("eid"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events
      .filter(userCol.isNotNull && tsCol.isNotNull && typeCol.isNotNull)
      .select(userCol.as("user"), unix_micros(tsCol).as("us"),
        typeCol.as("et"), idCol.as("eid"))
      .withColumn("ns",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) >= gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(wRun))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user"), col("sid"))
          .orderBy(col("us"), col("eid"))))
      .filter(col("rn") <= depth)
    val paths = sess
      .groupBy("user", "sid")
      .agg(concat_ws(">",
        (1 to depth).map(i => max(when(col("rn") === i, col("et")))): _*)
        .as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
    paths
      .withColumn("__tot",
        sum(col("n_sessions")).over(Window.partitionBy()))
      .withColumn("share_ppm", expr("(n_sessions * 1000000) DIV __tot"))
      .select("path", "n_sessions", "share_ppm")
  }

  /** Audience overlap matrix — exact Jaccard between the USER SETS of
    * every pair of event types ("how much do viewers and buyers
    * overlap"): one shuffle to per-user type SETS (collect_set has a
    * partial-aggregate arm), then every user's unordered type pairs
    * generate MAP-SIDE from that bounded set (≤ |types|² per user — the
    * quadratic lives in the enumerable TYPE dimension, never in users),
    * and the pair counts aggregate to a |types|²-bounded matrix.
    * Audience sizes broadcast back; Jaccard is ppm over the
    * inclusion–exclusion union. Output one row per pair
    * `type_a < type_b` with n_both ≥ 1.
    *
    * Three key shuffles total (user sets, sizes, pair cells) — no
    * self-join of the (user, type) table back onto itself.
    */
  def audienceOverlap(
      events: DataFrame,
      userCol: Column,
      typeCol: Column
  ): DataFrame = {
    val sets = events.filter(userCol.isNotNull && typeCol.isNotNull)
      .select(userCol.as("u"), typeCol.as("t"))
      .groupBy("u").agg(collect_set(col("t")).as("__ts"))
    val sizes = sets.select(explode(col("__ts")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
    val inter = sets
      .select(explode(expr(
        "filter(flatten(transform(__ts, x -> transform(__ts, " +
          "y -> struct(x AS a, y AS b)))), p -> p.a < p.b)")).as("p"))
      .groupBy(col("p.a").as("type_a"), col("p.b").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    inter
      .join(broadcast(sizes.select(col("t").as("type_a"), col("n").as("n_a"))),
        Seq("type_a"))
      .join(broadcast(sizes.select(col("t").as("type_b"), col("n").as("n_b"))),
        Seq("type_b"))
      .withColumn("jaccard_ppm",
        expr("(n_both * 1000000) DIV (n_a + n_b - n_both)"))
      .select("type_a", "type_b", "n_a", "n_b", "n_both", "jaccard_ppm")
  }

  /** Day-k conversion curve per signup cohort — the survival-style
    * funnel metric: users cohort by the epoch-week of their FIRST
    * event, and each cohort reports how many converted (first
    * `convType` event) within 1, 3, and 7 days of that first touch,
    * as exact counts and ppm shares of the cohort. "Within k days"
    * means `first_conv_day − first_seen_day < k` on epoch days —
    * integer, boundary-exact. Users who never convert count in
    * `n_users` only — the denominator a survival curve needs.
    *
    * Scale: one shuffle to the user grain (min-aggregates), one to
    * cohort cells; nothing quadratic, no windows.
    */
  def conversionCurve(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      convType: String
  ): DataFrame = {
    val perUser = events
      .filter(userCol.isNotNull && tsCol.isNotNull && typeCol.isNotNull)
      .select(userCol.as("u"),
        unix_timestamp(tsCol).cast("long").as("sec"), typeCol.as("et"))
      .withColumn("day", expr("sec DIV 86400"))
      .groupBy("u")
      .agg(min(col("day")).as("first_day"),
        min(when(col("et") === convType, col("day"))).as("conv_day"))
    def convWithin(k: Int): Column =
      sum(when(col("conv_day").isNotNull &&
        col("conv_day") - col("first_day") < k, 1L).otherwise(0L))
    perUser
      .withColumn("cohort_week", expr("first_day DIV 7"))
      .groupBy("cohort_week")
      .agg(count(lit(1)).as("n_users"),
        convWithin(1).as("conv_1d"),
        convWithin(3).as("conv_3d"),
        convWithin(7).as("conv_7d"))
      .withColumn("conv_7d_ppm", expr("(conv_7d * 1000000) DIV n_users"))
  }

  /** Weekly cohort retention: users are cohorted by the ISO week of
    * their first event; the output counts, for every (cohort_week,
    * week_offset) cell, the distinct users from that cohort active in
    * that week. `week_offset` 0 is the cohort week itself, so every
    * cohort's offset-0 cell equals its size.
    *
    * Output: `(cohort_week, week_offset, n_users)`.
    *
    * Scale shape: first-seen is a min-aggregate on the user key; the
    * (user, week) activity grid is a distinct on the same key plus the
    * truncated week (map-side partial dedup takes the bulk), and the
    * final cell count groups a frame already reduced to user×week —
    * orders of magnitude below the raw log. All shuffles key on user
    * until the last tiny cell aggregation.
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: Column,
      tsCol: Column
  ): DataFrame = {
    val activity = events
      .select(userCol.as("user"), date_trunc("week", tsCol).as("week"))
      .distinct()
    val cohort = activity.groupBy("user").agg(min("week").as("cohort_week"))
    activity.join(cohort, Seq("user"))
      .select(col("user"), col("cohort_week"),
        // weeks are truncation-aligned, so the day diff is an exact
        // multiple of 7 and the division is exact
        (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count_distinct(col("user")).as("n_users"))
  }

  /** First-order Markov transition matrix over per-key event sequences:
    * how often does event type `a` lead directly to type `b`, and with
    * what conditional probability — the behavioral-model table behind
    * next-action prediction, anomaly scoring ("this transition never
    * happens") and funnel design. Counts are exact; probabilities are
    * integer ppm (`n_ab·10⁶ div Σ_b n_ab`), the q89 conditional-model
    * convention, so the matrix is engine-portable. `ordCol` breaks
    * timestamp ties totally — without it, equal-time events would pair
    * nondeterministically. Each key's LAST event has no successor and
    * contributes no transition; NULL key/time/type rows are excluded.
    *
    * Scale shape: one per-key ordered window (the lead) on the event
    * stream, then one (from, to) aggregate that collapses to the type
    * vocabulary map-side; row totals re-aggregate from the checkpointed
    * counts table (vocab-sized, never a second stream pass).
    */
  def transitionMatrix(
      events: DataFrame,
      keyCol: Column,
      tsCol: Column,
      typeCol: Column,
      ordCol: Column
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__o"))
    val counts = events
      .select(keyCol.as("__k"), tsCol.as("__t"), typeCol.as("from_type"),
        ordCol.as("__o"))
      .filter(col("__k").isNotNull && col("__t").isNotNull &&
        col("from_type").isNotNull)
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val heads = counts.groupBy("from_type").agg(sum(col("n")).as("__nh"))
    counts.join(heads, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000) DIV __nh").as("cond_ppm"))
  }

  /** RFM segmentation — the classic behavioral scoring: per user,
    * Recency (days since last event, against the corpus's max
    * timestamp), Frequency (event count) and Monetary (exact cent
    * sum), each cut into quintiles by `ntile(5)` with a user-id
    * tie-break (equal metrics would otherwise make bucket assignment
    * a row-order lottery), composed into the familiar 3-digit
    * `rfm_code` (`r·100 + f·10 + m`; every digit quintile is ascending
    * in its RAW metric — r=5 is the STALEST, f=5/m=5 the heaviest).
    *
    * Scale shape: the event log collapses to ONE row per user first
    * (one shuffle, map-side partials); the three ntile windows then
    * sort the USER table, not the log — cardinality-bounded. The
    * windows are global by definition (population quintiles); past
    * ~10⁸ users use [[rfmSegmentsHist]] — the bit-identical
    * histogram-rank twin with no single-reducer sort, no boundary-tie
    * loss.
    */
  def rfmSegments(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      valueCol: Column
  ): DataFrame = {
    val per = events
      .filter(userCol.isNotNull && tsCol.isNotNull && valueCol.isNotNull)
      .select(userCol.as("user"), unix_timestamp(tsCol).cast("long").as("__t"),
        floor(valueCol * 100d).cast("long").as("__cents"))
      .groupBy("user")
      .agg(max(col("__t")).as("__last"), count(lit(1)).as("frequency"),
        sum(col("__cents")).as("monetary_cents"))
    val gmax = per.agg(max(col("__last")).as("__gmax"))
    def q(order: Column*) =
      ntile(5).over(Window.orderBy(order: _*)).cast("long")
    per.crossJoin(broadcast(gmax))
      .withColumn("recency_days", expr("(__gmax - __last) DIV 86400"))
      .withColumn("r_q", q(col("recency_days"), col("user")))
      .withColumn("f_q", q(col("frequency"), col("user")))
      .withColumn("m_q", q(col("monetary_cents"), col("user")))
      .withColumn("rfm_code",
        col("r_q") * 100L + col("f_q") * 10L + col("m_q"))
      .select(col("user"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_q"), col("f_q"), col("m_q"),
        col("rfm_code"))
  }

  /** [[rfmSegments]]'s SCALE-SAFE twin — bit-identical output (pinned
    * in `BehaviorSpec`, oracle-gated as q320 against the plain-ntile
    * oracle), with the three global `ntile(5)` sort windows replaced
    * by [[graft.ops.Stats.ntileHist]]'s exact histogram ranks: each
    * metric's quintile comes from per-value counts + the distributed
    * prefix-sum, so past ~10⁸ users nothing ever sorts the user table
    * on one reducer. The per-user frame is lazily localCheckpointed
    * once and shared by the three rank machines.
    */
  def rfmSegmentsHist(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      valueCol: Column
  ): DataFrame = {
    val per = events
      .filter(userCol.isNotNull && tsCol.isNotNull && valueCol.isNotNull)
      .select(userCol.as("user"), unix_timestamp(tsCol).cast("long").as("__t"),
        floor(valueCol * 100d).cast("long").as("__cents"))
      .groupBy("user")
      .agg(max(col("__t")).as("__last"), count(lit(1)).as("frequency"),
        sum(col("__cents")).as("monetary_cents"))
    val gmax = per.agg(max(col("__last")).as("__gmax"))
    val base = per.crossJoin(broadcast(gmax))
      .withColumn("recency_days", expr("(__gmax - __last) DIV 86400"))
      .localCheckpoint(false)
    val tiled = Seq(
      ("recency_days", "r_q"), ("frequency", "f_q"),
      ("monetary_cents", "m_q")
    ).foldLeft(base) { case (df, (metric, q)) =>
      graft.ops.Stats.ntileHist(df, 5, col(metric), col("user"), q)
    }
    tiled
      .withColumn("rfm_code",
        col("r_q") * 100L + col("f_q") * 10L + col("m_q"))
      .select(col("user"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_q"), col("f_q"), col("m_q"),
        col("rfm_code"))
  }

  /** Conversion latency profile — for users who completed the WHOLE
    * [[funnel]], the first-stage→last-stage elapsed seconds, summarized
    * per first-stage DAY with exact rank percentiles (the q57
    * convention: value at integer ceil-division rank ⌈n·p⌉ over the
    * ascending sort — equal latencies make the picked VALUE
    * tie-proof). The "how long
    * does view→purchase take, and is it drifting" operational readout.
    *
    * Scale shape: the funnel's chained filtered-min joins, then ONE
    * per-day sort window + aggregate — percentiles partition by day,
    * so no global single-partition sort ever happens; a day's
    * conversions are the natural unit a latency profile is read at.
    * Timestamps floor to epoch seconds (the q155/q157 convention).
    */
  def conversionLatency(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      stages: Seq[String]
  ): DataFrame = {
    require(stages.size >= 2, "conversion needs at least two stages")
    val n = stages.size
    val conv = funnel(events, userCol, tsCol, typeCol, stages)
      .filter(col(s"t$n").isNotNull)
      .select(col("user"),
        unix_timestamp(col("t1")).cast("long").as("__ep1"),
        (unix_timestamp(col(s"t$n")) - unix_timestamp(col("t1")))
          .cast("long").as("lat_sec"))
      // positive epochs: DIV ≡ floor ≡ the oracle's //
      .withColumn("day", expr("__ep1 DIV 86400"))
      .drop("__ep1")
    val w = Window.partitionBy(col("day")).orderBy(col("lat_sec"), col("user"))
    val wn = Window.partitionBy(col("day"))
    conv
      .withColumn("rn", row_number().over(w))
      .withColumn("nn", count(lit(1)).over(wn))
      .groupBy("day")
      // integer ceil-division ranks (the q183 convention): ⌈0.9·n⌉ as
      // (9n + 9) DIV 10, not ceil(n·0.9) — IEEE 20·0.9 > 18 bumps the
      // double spelling's rank to 19
      .agg(max(col("nn")).as("n_conv"),
        max(when(col("rn") === expr("(nn + 1) DIV 2"), col("lat_sec"))).as("p50_sec"),
        max(when(col("rn") === expr("(nn * 9 + 9) DIV 10"), col("lat_sec"))).as("p90_sec"),
        max(col("lat_sec")).as("max_sec"))
  }

  /** Contribution analysis — "WHICH segment drove the move": a metric
    * changed between period A and period B; decompose the total delta
    * by a dimension, reporting each segment's exact delta and its
    * SIGNED ppm share of the total (`share_ppm = Δ_seg·10⁶ DIV
    * Δ_total` — shares can exceed 10⁶ or go negative when segments
    * move in opposite directions; they always sum to ~10⁶ up to the
    * per-segment floor). The first question every on-call metric
    * review asks, answered with zero floating point.
    *
    * `inBCol` splits rows into the two periods; rows in neither/both
    * are the caller's bug, not this operator's (it trusts the
    * boolean). A zero total delta reports NULL shares (decomposition
    * of nothing).
    *
    * Scale: ONE hash-aggregate to dimension cells + a one-row total
    * broadcast — the groupBy().count() profile.
    */
  def deltaAttribution(
      df: DataFrame,
      dimCol: Column,
      inBCol: Column,
      valueCol: Column
  ): DataFrame = {
    val cells = df
      .filter(dimCol.isNotNull && inBCol.isNotNull)
      .select(dimCol.cast("string").as("segment"),
        inBCol.cast("boolean").as("b"),
        coalesce(valueCol.cast("long"), lit(0L)).as("v"))
      .groupBy("segment")
      .agg(sum(when(col("b"), 0L).otherwise(col("v"))).as("val_a"),
        sum(when(col("b"), col("v")).otherwise(0L)).as("val_b"))
      .withColumn("delta", expr("val_b - val_a"))
    val tot = cells.agg(sum(col("delta")).as("total_delta"))
    cells.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr(
        "CASE WHEN total_delta != 0 THEN" +
          " (CAST(delta AS DECIMAL(38,0)) * 1000000) DIV total_delta END"))
      .select(col("segment"), col("val_a"), col("val_b"), col("delta"),
        col("total_delta"), col("share_ppm"))
      .orderBy(abs(col("delta")).desc, col("segment"))
  }

  /** Markov-chain multi-touch attribution by REMOVAL EFFECT (Anderl,
    * Becker, v. Wangenheim & Schumann 2016) — the fourth standard model
    * next to [[lastTouchAttribution]], [[linearAttribution]] and
    * [[timeDecayAttribution]], and the only one that credits a channel
    * by what conversions would be LOST without it rather than by
    * position. Each user's pre-conversion journey becomes a path
    * `__start__ -> c1 -> ... -> cn -> __conv__/__drop__` (truncated at
    * the first conversion; first `maxPrefix` touches); transition
    * probabilities are floored ppm counts. The chain's conversion rate
    * is solved by `iters` rounds of value iteration with ONE floor per
    * state per round (`p'(s) = (Σ_t P_ppm(s→t)·p(t)) DIV 1e6`) —
    * bit-replayable, no linear-algebra library; geometric convergence
    * makes 24 rounds exact to well below 1 ppm for any chain whose
    * per-step continuation mass ≤ ~50%. A channel's removal chain
    * redirects ITS outgoing mass to `__drop__` (paths through it die);
    * `removal_ppm = base − removed` and shares are the clamped
    * normalized removals.
    *
    * Scale shape: journeys/transitions are two keyed shuffles over the
    * fact table; the SOLVE runs on the driver over the collected
    * (src, dst, count) table — configuration-sized by the
    * `maxChannels` REQUIRE (the bounded-driver-work precedent of
    * `Dedup.clusterLabels`' union-find and `QualityModel`'s GD), never
    * row-scaled. Determinism: counts are exact integers, the solve is
    * a pure function of them.
    *
    * Output per channel: `n_out` (journey transitions leaving it),
    * `base_conv_ppm` (the full chain, same every row),
    * `removed_conv_ppm`, `removal_ppm`, `share_ppm` (NULL when no
    * channel has positive removal).
    */
  def markovAttribution(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      idCol: Column,
      convType: String,
      maxPrefix: Int = 50,
      iters: Int = 24,
      maxChannels: Int = 50
  ): DataFrame = {
    require(maxPrefix >= 1 && iters >= 1 && maxChannels >= 1)
    val spark = events.sparkSession
    import spark.implicits._
    val S = "__start__"; val CONV = "__conv__"; val DROP = "__drop__"
    val (touches, convs) =
      journeyTouches(events, userCol, tsCol, typeCol, idCol, convType,
        maxPrefix)
    // ONE journey-grain pass builds the transition multiset. The 4-union
    // formulation this replaces (lead/max windows for first/mid/last rows
    // + a distinct + anti-join for direct conversions) re-scanned the
    // checkpointed touches three times and shuffled a touch-grain
    // distinct; here each user's sorted touch array emits its whole
    // chain map-side — (S, j₁), (jᵢ, jᵢ₊₁)…, (jₙ, CONV/DROP) — and the
    // direct-conversion rows anti-join against the already-user-grain
    // journey table. Multiset equivalence with the union shape (the
    // oracle replays it): element 0 of the sorted array is the rn=1 row
    // (tFirst), consecutive array slots are exactly lead() over the rn
    // order (tMid), the last slot is the rn=maxrn row with the per-user
    // constant converted flag (tLast), and conv users absent from
    // touches are absent from journeys (tDirect) — pinned old-vs-new in
    // BehaviorSpec. The per-journey transform is interpreted (HOF), but
    // runs over ≤ maxPrefix elements per user.
    val journeys = touches
      .groupBy("user")
      .agg(array_sort(collect_list(struct(col("rn"), col("et")))).as("__j"),
        max(col("converted")).as("__conv"))
    val chain = journeys
      .select(explode(expr(
        s"""concat(
           |  transform(__j, (x, i) ->
           |    named_struct('src', IF(i = 0, '$S', __j[i - 1].et),
           |                 'dst', x.et)),
           |  array(named_struct('src', element_at(__j, -1).et,
           |                     'dst', IF(__conv, '$CONV', '$DROP'))))"""
          .stripMargin)).as("t"))
      .select(col("t.src").as("src"), col("t.dst").as("dst"))
    val tDirect = convs.select("user")
      .join(journeys.select("user"), Seq("user"), "left_anti")
      .select(lit(S).as("src"), lit(CONV).as("dst"))
    val counts = chain.union(tDirect)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val channels = counts.flatMap(t => Seq(t._1, t._2))
      .filter(s => s != S && s != CONV && s != DROP).distinct.sorted
    require(channels.size <= maxChannels,
      s"markovAttribution: ${channels.size} channels exceed maxChannels=" +
        s"$maxChannels - bucket the channel dimension first")
    if (channels.isEmpty) {
      Seq.empty[(String, Long, Long, Long, Long, Option[Long])]
        .toDF("channel", "n_out", "base_conv_ppm", "removed_conv_ppm",
          "removal_ppm", "share_ppm")
    } else {
      val outTotals = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      // floored ppm transition rows of the BASE chain
      val probs = counts.map { case (src, dst, n) =>
        (src, dst, n * 1000000L / outTotals(src)) }
      val states = (S +: channels) ++ Seq(CONV, DROP)
      def solve(removed: Option[String]): Long = {
        val tr = probs.flatMap { case (src, dst, p) =>
          if (removed.contains(src)) None else Some((src, dst, p))
        } ++ removed.map(c => (c, DROP, 1000000L))
        val bySrc = tr.groupBy(_._1)
        var p = states.map(s => s -> (if (s == CONV) 1000000L else 0L)).toMap
        for (_ <- 1 to iters) {
          p = states.map { s =>
            if (s == CONV || s == DROP) s -> p(s)
            else s -> bySrc.get(s).map(_.map { case (_, dst, pr) =>
              pr * p(dst) }.sum / 1000000L).getOrElse(0L)
          }.toMap
        }
        p(S)
      }
      val basePpm = solve(None)
      val removals = channels.map(c => c -> solve(Some(c)))
      val posTotal = removals.map { case (_, r) => math.max(basePpm - r, 0L) }.sum
      removals.toSeq.map { case (c, r) =>
        val rem = basePpm - r
        (c, outTotals.getOrElse(c, 0L), basePpm, r, rem,
          if (posTotal > 0) Some(math.max(rem, 0L) * 1000000L / posTotal)
          else None)
      }.toDF("channel", "n_out", "base_conv_ppm", "removed_conv_ppm",
        "removal_ppm", "share_ppm")
    }
  }

  /** The shared journey front of the chain-based attribution models:
    * pre-conversion touches per user (strict (sec, eid) order,
    * truncated at the user's FIRST conversion and at `maxPrefix`),
    * with `rn` and a `converted` flag, eagerly checkpointed — plus the
    * per-user first-conversion table. Extracted from
    * [[markovAttribution]] verbatim so [[shapleyAttribution]] cannot
    * drift from it.
    */
  private def journeyTouches(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      idCol: Column,
      convType: String,
      maxPrefix: Int
  ): (DataFrame, DataFrame) = {
    val base = events
      .filter(userCol.isNotNull && tsCol.isNotNull && typeCol.isNotNull &&
        idCol.isNotNull)
      .select(userCol.as("user"), unix_timestamp(tsCol).cast("long").as("sec"),
        typeCol.cast("string").as("et"), idCol.cast("long").as("eid"))
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
      .filter(col("rn") <= maxPrefix)
      .withColumn("converted", col("conv_sec").isNotNull)
      .localCheckpoint(false)
    (touches, convs)
  }

  /** Observed-coalition Shapley attribution (Shapley 1953; the
    * simplified marketing form of Zhao, Mahboobi & Bagheri 2018) — the
    * FIFTH standard multi-touch model next to [[lastTouchAttribution]],
    * [[linearAttribution]], [[timeDecayAttribution]] and
    * [[markovAttribution]], and the only one whose credits are
    * position-free AND marginal: a channel earns what it ADDS to the
    * coalitions it appears in. Each user's journey reduces to its
    * DISTINCT channel set `S`; every observed set's conversion rate is
    * the floored ppm `v(S) = conv·10⁶ DIV journeys`; and each journey
    * with set `S` pays every member `c` the marginal share
    * `(v(S) − v(S∖{c})) DIV |S|` — unobserved sub-coalitions value 0
    * (the observed-coalition simplification: fabricating rates for
    * never-seen sets would be model invention, not measurement).
    * Channel credit is the exact integer sum over journeys;
    * `share_ppm` normalizes the CLAMPED-positive credits (the
    * [[markovAttribution]] share convention). Direct conversions (no
    * touches) have no coalition to pay — same as the linear model.
    *
    * Scale shape: the [[journeyTouches]] front (two keyed shuffles), a
    * set-grain aggregate (bounded by distinct users), one explode +
    * one equi-join on the set string key, one channel-grain aggregate,
    * and a one-row positive-total broadcast. Fully distributed — no
    * driver solve, no channel-count cap needed (the set STRING is
    * bounded by `maxPrefix` channels).
    *
    * Channel names must be non-empty and must not contain `|` (the
    * set-key separator; an empty name would key the singleton `{""}`
    * like the empty coalition) — a require fail-stops on both;
    * [[shapleyAttributionSanitized]] is the front that never throws.
    *
    * Output per channel: `n_journeys` (journeys whose set contains the
    * channel), `credit_ppm` (signed exact sum), `share_ppm`.
    */
  def shapleyAttribution(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      idCol: Column,
      convType: String,
      maxPrefix: Int = 50
  ): DataFrame = {
    require(maxPrefix >= 1, s"maxPrefix must be >= 1: $maxPrefix")
    val (touches, _) =
      journeyTouches(events, userCol, tsCol, typeCol, idCol, convType,
        maxPrefix)
    val sets = touches
      .groupBy("user")
      .agg(array_sort(collect_set(col("et"))).as("s"),
        max(col("converted")).as("__conv"))
    val vset = sets
      .groupBy("s")
      .agg(count(lit(1)).as("n_j"),
        sum(when(col("__conv"), 1L).otherwise(0L)).as("__nc"))
      .withColumn("sk", concat_ws("|", col("s")))
      .withColumn("v_ppm", expr("(__nc * 1000000) DIV n_j"))
      .localCheckpoint(false)
    // the set key must be injective: a channel containing the
    // separator would alias two different sets, and an EMPTY channel
    // name would alias the singleton {""} with the empty coalition
    // (concat_ws keys both as "") — silently skewing every singleton's
    // marginal. Fail-stop on both; shapleyAttributionSanitized is the
    // never-throws front.
    require(
      vset.filter(expr("exists(s, x -> x = '' OR x LIKE '%|%')")).isEmpty,
      "shapleyAttribution: channel names must be non-empty and must " +
        "not contain '|' (use shapleyAttributionSanitized)")
    val contrib = vset
      .select(col("sk"), col("n_j"), col("v_ppm"), col("s"),
        explode(col("s")).as("channel"))
      .withColumn("__pk", expr("concat_ws('|', filter(s, x -> x != channel))"))
      .join(vset.select(col("sk").as("__pk"), col("v_ppm").as("__pv")),
        Seq("__pk"), "left")
      .withColumn("__c", expr(
        "(v_ppm - coalesce(__pv, CAST(0 AS BIGINT))) DIV size(s)"))
      .groupBy("channel")
      .agg(sum(col("n_j")).as("n_journeys"),
        sum(col("n_j") * col("__c")).as("credit_ppm"))
    val tot = contrib.agg(
      sum(greatest(col("credit_ppm"), lit(0L))).as("__pos"))
    contrib.crossJoin(broadcast(tot))
      .withColumn("share_ppm",
        when(col("__pos") > 0, expr(
          "(greatest(credit_ppm, CAST(0 AS BIGINT)) * 1000000) DIV __pos")))
      .select(col("channel"), col("n_journeys"), col("credit_ppm"),
        col("share_ppm"))
  }

  /** Sanitizing front for [[shapleyAttribution]] on UNTRUSTED channel
    * dimensions (the r17 verdict's "mirror the Markov treatment" item):
    * where the raw operator fail-stops on a channel name that would
    * break set-key injectivity — a `|` (the separator) or the empty
    * string (aliases the empty coalition) — this front PERCENT-ESCAPES
    * the alphabet instead of throwing six hours into a 100 TB job:
    * `%`→`%25` first, then `|`→`%7C`, and the empty name becomes `%E`
    * (collision-free: a LITERAL `%E` channel escapes to `%25E`). The
    * map is injective, so credits computed on the escaped alphabet are
    * exactly the credits on the original one — unlike the Markov
    * bucketing this degrade loses NOTHING — and the output channel
    * column is unescaped back to the original names. The conversion
    * marker is escaped consistently, so journey/conversion matching is
    * preserved by injectivity. NULL types stay NULL (missing, not a
    * channel). The q322 oracle recomputes Shapley over LIST-valued
    * coalition keys — no string keys at all — so an aliasing bug in
    * this escape could not hide behind a matching oracle.
    */
  def shapleyAttributionSanitized(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      idCol: Column,
      convType: String,
      maxPrefix: Int = 50
  ): DataFrame = {
    def escCol(c: Column): Column =
      when(c === "", lit("%E"))
        .otherwise(call_function("replace",
          call_function("replace", c, lit("%"), lit("%25")),
          lit("|"), lit("%7C")))
    def escStr(s: String): String =
      if (s == "") "%E" else s.replace("%", "%25").replace("|", "%7C")
    val et = typeCol.cast("string")
    // decode order inverts encode order: %7C first (no '%25'-escaped
    // byte sequence can spell it), then %25
    def unesc(c: Column): Column =
      when(c === "%E", lit(""))
        .otherwise(call_function("replace",
          call_function("replace", c, lit("%7C"), lit("|")),
          lit("%25"), lit("%")))
    shapleyAttribution(events, userCol, tsCol,
        when(et.isNull, et).otherwise(escCol(et)), idCol,
        escStr(convType), maxPrefix)
      .withColumn("channel", unesc(col("channel")))
      .select("channel", "n_journeys", "credit_ppm", "share_ppm")
  }

  /** Graceful-degrade front for [[markovAttribution]] on HIGH-CARDINALITY
    * channel dimensions (the r16 verdict item): where the raw operator
    * fail-stops when the distinct channel count exceeds `maxChannels`
    * (correct for a configuration-sized dimension, unkind six hours into
    * a 100 TB job), this wrapper first buckets the tail — the top
    * `topChannels` channels by PRE-TRUNCATION touch volume keep their
    * identity (ties broken on channel name, so the cut is a pure
    * function of the data), every other channel becomes `__other__` —
    * and then runs the chain solve on the bounded alphabet
    * (`maxChannels = topChannels + 1`, so the wrapped call can never
    * throw). The `__other__` row reports the AGGREGATE removal effect of
    * the long tail, which is exactly the reading a capped attribution
    * can honestly give ("the tail as a whole moved X ppm") — per-channel
    * credit inside the tail is unidentifiable once bucketed, and
    * pretending otherwise would be fabrication, not degradation.
    *
    * Scale shape: ONE extra hash-aggregate to channel grain plus a
    * driver `limit(topChannels)` take-ordered (bounded by the distinct
    * channel count, never row-scaled); the remap is a literal `isin`
    * over ≤ `topChannels` strings evaluated map-side — no join, no
    * shuffle added to [[markovAttribution]]'s own two.
    */
  def markovAttributionBucketed(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      idCol: Column,
      convType: String,
      topChannels: Int = 10,
      maxPrefix: Int = 50,
      iters: Int = 24
  ): DataFrame = {
    require(topChannels >= 1, s"topChannels must be >= 1: $topChannels")
    val OTHER = "__other__"
    val et = typeCol.cast("string")
    val top = events
      .filter(userCol.isNotNull && tsCol.isNotNull && typeCol.isNotNull &&
        idCol.isNotNull)
      .select(et.as("et"))
      .filter(col("et") =!= convType)
      .groupBy("et").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("et"))
      .limit(topChannels)
      .collect().map(_.getString(0)).toSeq
    // null stays null (the raw operator's not-null filter must still see
    // it as missing, not as a __other__ touch)
    val remapped = when(et.isNull, et)
      .when(et === convType || et.isin(top: _*), et)
      .otherwise(lit(OTHER))
    markovAttribution(events, userCol, tsCol, remapped, idCol, convType,
      maxPrefix, iters, maxChannels = topChannels + 1)
  }
}
