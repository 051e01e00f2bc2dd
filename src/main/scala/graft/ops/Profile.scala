package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling — the audit table a pipeline publishes before
  * anyone trains on (or joins against) a freshly landed corpus: per-column
  * null counts, distinct cardinality and value range, one row per column.
  * The reference pipeline has no profiling stage (its schema is 3 fixed
  * columns, `PythonKafkaSink/main.py:14-18`); at 100 TB a profile is the
  * first gate every ingest runs, so it is first-class here.
  *
  * Scale shape: ONE aggregate pass over the table — the multi-column
  * `count(DISTINCT x)` set plans as a single Expand + two-phase aggregate
  * (one shuffle, expand factor = #profiled columns), never one job per
  * column; min/max/null counters ride the same pass. The long-form pivot
  * at the end is a per-row `explode` over an N_cols-element array on a
  * ONE-ROW frame — free. Distinct counts are exact by contract (the gate
  * is an equality check against yesterday's profile; for
  * monitoring-grade profiles swap `countDistinct` for
  * `approx_count_distinct` and the pass drops the Expand entirely).
  */
object Profile {

  /** Profile `cols` (name → canonical column) in one pass. Each canonical
    * column must already be in an engine-portable representation — BIGINT
    * or STRING (the caller maps doubles to exact micros, timestamps to
    * epoch seconds): min/max are computed on the canonical value and cast
    * to STRING for the long form, and a raw DOUBLE's string rendering is
    * NOT portable across engines.
    *
    * Output: `(col_name, n_rows, n_nulls, n_distinct, min_repr,
    * max_repr)`, one row per profiled column; `n_distinct` excludes NULLs
    * (SQL `count(DISTINCT …)` semantics), `min_repr`/`max_repr` are NULL
    * for an all-NULL column.
    */
  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.zipWithIndex.flatMap { case ((_, c), i) =>
      Seq(
        sum(c.isNull.cast("long")).as(s"__nulls_$i"),
        countDistinct(c).as(s"__dist_$i"),
        min(c).cast("string").as(s"__min_$i"),
        max(c).cast("string").as(s"__max_$i"))
    }
    val onePass = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val perCol = cols.zipWithIndex.map { case ((name, _), i) =>
      struct(
        lit(name).as("col_name"),
        col("__rows").as("n_rows"),
        col(s"__nulls_$i").as("n_nulls"),
        col(s"__dist_$i").as("n_distinct"),
        col(s"__min_$i").as("min_repr"),
        col(s"__max_$i").as("max_repr"))
    }
    onePass
      .select(explode(array(perCol: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_repr"), col("p.max_repr"))
  }

  /** Equi-width histogram over an integer-canonical column (same
    * portability contract as [[profile]]: the caller maps doubles to
    * exact millis/micros first) — the distribution companion to the
    * range row above, and the input a query planner's selectivity
    * check or a drift monitor actually wants. `buckets` equal-width
    * bins over the OBSERVED [min, max]:
    * `bucket = (x − lo)·buckets floordiv (hi − lo + 1)` — the +1 span
    * keeps the maximum inside the last bucket with no clamp branch,
    * and a non-negative numerator makes DIV a true floor on every
    * engine. Only non-empty buckets are emitted, each with its exact
    * observed `(min_v, max_v)` — bounds by observation, not by the
    * (non-integral) theoretical bucket edges, so the output is
    * engine-portable without rounding fences.
    *
    * Scale shape: one min/max aggregate (2 longs to the driver), then
    * one map-side bucket projection + one ≤`buckets`-key aggregate —
    * the second pass's shuffle ships at most `buckets` cells per task.
    */
  def histogram(df: DataFrame, valueCol: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val base = df.select(valueCol.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val r = base.agg(min(col("__v")), max(col("__v"))).head()
    if (r.isNullAt(0))
      return base.select(lit(0L).as("bucket"), lit(0L).as("n_rows"),
        col("__v").as("min_v"), col("__v").as("max_v")).limit(0)
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    // span and numerator in DECIMAL(38,0): `hi − lo + 1` overflows BIGINT
    // when the observed range spans most of the long domain (epoch-micros
    // scale values), and `(v − lo)·buckets` overflows even sooner — the
    // decimal intermediates keep the arithmetic exact for ANY long-valued
    // column (DIV on decimals is still an integral floor, and the
    // numerator is non-negative by construction).
    val span = (BigInt(hi) - BigInt(lo)) + 1
    base
      .withColumn("__num",
        (col("__v").cast(org.apache.spark.sql.types.DecimalType(38, 0)) - lit(lo))
          * lit(buckets.toLong))
      .withColumn("bucket", expr(s"__num DIV CAST('$span' AS DECIMAL(38,0))"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col("__v")).as("min_v"), max(col("__v")).as("max_v"))
  }

  /** Per-column top-`k` values by count — the heavy-hitters sheet next
    * to [[profile]]'s range row: default/sentinel pollution ("", "n/a",
    * an epoch-zero date) shows up here first, and the hot keys it
    * surfaces are [[Skew]]'s candidate list. Values ride as their
    * canonical STRING representation ([[profile]]'s portability
    * contract); NULL is a countable value (its own row). Rank ties
    * break on the value string ascending, NULLS FIRST.
    *
    * Scale shape: one explode over an N_cols array (scan amplification
    * = #profiled columns, same as [[profile]]'s Expand), one
    * (col, value) aggregate with map-side partials, then a per-column
    * top-k window over the AGGREGATED counts — cardinality-bounded,
    * never row-bounded.
    */
  def topValues(df: DataFrame, cols: Seq[(String, Column)], k: Int): DataFrame = {
    require(cols.nonEmpty && k > 0, "topValues needs columns and k > 0")
    import org.apache.spark.sql.expressions.Window
    val pairs = df.select(explode(array(cols.map { case (n, c) =>
      struct(lit(n).as("col_name"), c.cast("string").as("value_repr"))
    }: _*)).as("p")).select(col("p.col_name"), col("p.value_repr"))
    val w = Window.partitionBy(col("col_name"))
      .orderBy(col("n").desc, col("value_repr").asc_nulls_first)
    pairs.groupBy("col_name", "value_repr")
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Functional-dependency audit: does `lhs` determine `rhs`? One row
    * per VIOLATING lhs value — the data-contract check behind "one
    * user, one country" / "one order, one status" assumptions that
    * joins and dedups silently rely on. Reports the distinct-rhs
    * count and the (min, max) rhs representations as the two witness
    * values an engineer pastes into the bug report. NULL rhs values
    * are ignored (SQL DISTINCT-count semantics: an unknown can't
    * witness a contradiction); NULL lhs is its own group.
    *
    * Scale shape: one (lhs, rhs)-keyed distinct-style aggregate then a
    * per-lhs rollup — the exact-dedup plan family; output is bounded
    * by the violating keys, not the table.
    */
  def fdViolations(df: DataFrame, lhs: Column, rhs: Column): DataFrame =
    df.select(lhs.as("lhs"), rhs.cast("string").as("__r"))
      .groupBy("lhs")
      .agg(count_distinct(col("__r")).as("n_distinct_rhs"),
        min(col("__r")).as("rhs_min"), max(col("__r")).as("rhs_max"),
        count(lit(1)).as("n_rows"))
      .filter(col("n_distinct_rhs") > 1)

  /** Null-rate trend: per period (day) and column, the NULL share in
    * ppm — completeness drift over TIME, which the single-shot
    * [[profile]] cannot show (an upstream schema regression looks like
    * a step in this series days before anyone reads a one-off
    * profile). Rows without a timestamp have no period and are
    * excluded — exactly the rows every watermark-governed operator
    * also skips, so the series describes what the pipeline actually
    * processed.
    *
    * Scale shape: ONE aggregate keyed by day (per-column null counters
    * ride the same pass — no Expand, no per-column jobs), then the
    * long-form explode runs on the tiny day-count frame.
    */
  def nullRateDaily(
      df: DataFrame,
      tsCol: Column,
      cols: Seq[(String, Column)]
  ): DataFrame = {
    require(cols.nonEmpty, "nullRateDaily needs at least one column")
    val aggs = cols.zipWithIndex.map { case ((_, c), i) =>
      sum(c.isNull.cast("long")).as(s"__nulls_$i")
    }
    val perDay = df.filter(tsCol.isNotNull)
      .withColumn("__ep", unix_timestamp(tsCol).cast("long"))
      .withColumn("day", expr("__ep DIV 86400"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val long = cols.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("col_name"), col(s"__nulls_$i").as("n_nulls"))
    }
    perDay
      .select(col("day"), col("n_rows"), explode(array(long: _*)).as("p"))
      .select(col("day"), col("p.col_name"), col("n_rows"), col("p.n_nulls"))
      .withColumn("null_ppm", expr("(n_nulls * 1000000) DIV n_rows"))
  }

  /** Foreign-key audit: referential integrity of `child.fk → parent.pk`
    * as one row — child rows, NULL foreign keys (excused from the
    * check, reported separately), and ORPHANS (non-NULL keys with no
    * parent). The join-correctness precondition every silent
    * inner-join row loss traces back to; 0 orphans is an ASSERTION
    * worth publishing, not a boring result.
    *
    * Scale shape: one anti join on the key (AQE picks broadcast when
    * the parent's distinct keys fit) + one aggregate; the parent side
    * is reduced to distinct keys first so the anti probe ships keys,
    * not rows.
    */
  def fkAudit(
      child: DataFrame, fkCol: Column,
      parent: DataFrame, pkCol: Column,
      fkName: String
  ): DataFrame = {
    val keys = parent.select(pkCol.as("__pk")).filter(col("__pk").isNotNull)
      .distinct()
    val base = child.select(fkCol.as("__fk"))
    val orphans = base.filter(col("__fk").isNotNull)
      .join(keys, col("__fk") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    base.agg(count(lit(1)).as("n_child"),
        sum(col("__fk").isNull.cast("long")).as("n_null_fk"))
      .crossJoin(broadcast(orphans))
      .select(lit(fkName).as("fk_name"), col("n_child"), col("n_null_fk"),
        col("n_orphans"))
  }

  /** Join-size forecast: the EXACT output cardinality of an equi-join,
    * computed from per-key counts WITHOUT materializing the join —
    * `|A ⋈ B|  =  Σ_k cntA(k)·cntB(k)`. The companion to
    * [[shuffleBalance]]: that one prices the shuffle, this one prices
    * the join's OUTPUT, which is where self-joins and low-selectivity
    * keys go quadratic. Reports the `topN` contributing keys (the
    * rows an engineer blocks or salts first) with each key's share of
    * the total in ppm; NULL keys never match in an equi-join and are
    * excluded.
    *
    * Scale shape: one aggregate per side, an inner join of the two
    * AGGREGATED key tables (cardinality-bounded), a one-row total
    * broadcast onto the top-N slice — the fact tables are each read
    * once and never joined.
    */
  def joinSizeForecast(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      topN: Int
  ): DataFrame = {
    require(topN > 0, "topN must be positive")
    import org.apache.spark.sql.expressions.Window
    def counts(df: DataFrame, k: Column, out: String) =
      df.select(k.cast("string").as("k")).filter(col("k").isNotNull)
        .groupBy("k").agg(count(lit(1)).as(out))
    val joined = counts(left, leftKey, "n_left")
      .join(counts(right, rightKey, "n_right"), Seq("k"))
      .withColumn("rows_out", col("n_left") * col("n_right"))
    val total = joined.agg(sum(col("rows_out")).as("total_rows"))
    // distributed top-N first (TakeOrderedAndProject), THEN the rank
    // window over the ≤topN survivors — no global sort window over the
    // full key table
    val w = Window.orderBy(col("rows_out").desc, col("k"))
    joined
      .orderBy(col("rows_out").desc, col("k")).limit(topN)
      .withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("(rows_out * 1000000) DIV total_rows"))
  }

  /** Data-contract runner: evaluate a suite of named row predicates in
    * ONE pass and report each constraint's violation count and ppm —
    * the executable form of a table's documented invariants (domain
    * ranges, non-null promises, enum membership), run as a single
    * aggregate whose counters ride together exactly like [[profile]]'s.
    * A NULL predicate result counts as a VIOLATION — "unknown" is not
    * a pass, and a constraint written against a sometimes-NULL column
    * must say `isNull ||` explicitly to excuse it.
    *
    * Scale shape: one aggregate, #constraints counters per task, then
    * the long-form explode on the one-row result — contract-checking a
    * 100 TB table costs one scan regardless of suite size.
    */
  def checkConstraints(
      df: DataFrame,
      constraints: Seq[(String, Column)]
  ): DataFrame = {
    require(constraints.nonEmpty, "checkConstraints needs at least one constraint")
    val aggs = constraints.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__viol_$i")
    }
    val onePass = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val long = constraints.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("constraint"), col(s"__viol_$i").as("n_violations"))
    }
    onePass
      .select(col("__rows"), explode(array(long: _*)).as("p"))
      .select(col("p.constraint"), col("__rows").as("n_rows"),
        coalesce(col("p.n_violations"), lit(0L)).as("n_violations"))
      .withColumn("violation_ppm",
        when(col("n_rows") > 0, expr("(n_violations * 1000000) DIV n_rows"))
          .otherwise(lit(0L)))
  }

  /** Release-ladder authoring contract shared by [[kAnonymize]] /
    * [[lDiversify]] / [[tCloseness]]: every level must bind IDENTICAL
    * column types, because the released schema must not depend on WHICH
    * level the data selects (a degenerate corpus vacuously accepts
    * level 0, and a raw-INT quasi column there would silently change
    * the release schema). Analysis-only — no job runs.
    */
  private def requireUniformLevelTypes(df: DataFrame, levels: Seq[Seq[Column]]): Unit = {
    val levelTypes = levels.map(lvl => df.select(lvl: _*).schema.map(_.dataType))
    require(levelTypes.distinct.size == 1,
      "all generalization levels must bind identical column TYPES " +
        s"(the release schema must not depend on the chosen level); got ${levelTypes.distinct}")
  }

  /** k-anonymity via full-domain generalization (Samarati's lattice,
    * walked as a single pre-declared ladder): `levels(i)` is one
    * generalization state — the quasi-identifier columns at coarseness
    * level `i`, all levels sharing `names`/types — and the operator
    * picks the FIRST level whose every equivalence class holds at
    * least `k` rows (falling back to the last level if none does:
    * the caller's ladder must end in a state coarse enough to accept,
    * e.g. full suppression). Output: one row per equivalence class at
    * the chosen level — the class's generalized quasi values, its
    * size, and the chosen `level` — the release-audit artifact a
    * privacy review signs off on.
    *
    * The level walk is a DRIVER loop of at most `levels.size` jobs
    * (each one shuffle on the quasi-combo, aggregating to class
    * cells); the ladder is declared configuration, bounded and tiny —
    * the documented bounded-trade pattern, same as the k-means
    * centroid loop. Suppressed columns are represented by a sentinel
    * the caller picks inside the level expressions (a literal), so
    * types stay uniform for the downstream union of levels.
    *
    * The k test is on class size only (k-anonymity proper); l-diversity
    * of sensitive columns is the caller's follow-up on the returned
    * classes.
    */
  def kAnonymize(
      df: DataFrame,
      names: Seq[String],
      levels: Seq[Seq[Column]],
      k: Long
  ): DataFrame = {
    require(levels.nonEmpty && k >= 1, "need at least one level and k >= 1")
    require(levels.forall(_.size == names.size),
      "every level must bind every quasi-identifier name")
    requireUniformLevelTypes(df, levels)
    def classes(lvl: Seq[Column]): DataFrame = df
      .groupBy(lvl.zip(names).map { case (c, n) => c.as(n) }: _*)
      .agg(count(lit(1)).as("n"))
    val chosen = levels.indices
      .find(i => classes(levels(i)).filter(col("n") < k).isEmpty)
      .getOrElse(levels.size - 1)
    classes(levels(chosen)).withColumn("level", lit(chosen.toLong))
  }

  /** l-diversity on top of [[kAnonymize]]'s ladder: the FIRST level
    * where every equivalence class both holds at least `k` rows AND
    * sees at least `l` DISTINCT values of the sensitive column is
    * released (last-level fallback, as in [[kAnonymize]]). k-anonymity
    * alone leaves the homogeneity attack open — a class of 50 rows that
    * all share one sensitive value identifies that value for every
    * member — so the release criterion must look at the sensitive
    * column's spread, not just class size. Output rows carry the class
    * quasi values, `n`, `n_sensitive` (distinct sensitive values), and
    * the chosen `level`.
    *
    * Same bounded driver walk as [[kAnonymize]] (≤ `levels.size` jobs,
    * one shuffle each); `count_distinct` adds a partial-aggregate pass
    * but no extra shuffle.
    */
  def lDiversify(
      df: DataFrame,
      names: Seq[String],
      levels: Seq[Seq[Column]],
      sensitiveCol: Column,
      k: Long,
      l: Long
  ): DataFrame = {
    require(levels.nonEmpty && k >= 1 && l >= 1,
      "need at least one level, k >= 1 and l >= 1")
    require(levels.forall(_.size == names.size),
      "every level must bind every quasi-identifier name")
    requireUniformLevelTypes(df, levels)
    def classes(lvl: Seq[Column]): DataFrame = df
      .groupBy(lvl.zip(names).map { case (c, n) => c.as(n) }: _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(sensitiveCol).as("n_sensitive"))
    val chosen = levels.indices
      .find(i => classes(levels(i))
        .filter(col("n") < k || col("n_sensitive") < l).isEmpty)
      .getOrElse(levels.size - 1)
    classes(levels(chosen)).withColumn("level", lit(chosen.toLong))
  }

  /** t-closeness on top of [[kAnonymize]]'s ladder — the third rung of
    * the release ladder ([[kAnonymize]] k, [[lDiversify]] l): the FIRST
    * level where every equivalence class holds at least `k` rows AND
    * its sensitive-value distribution sits within total-variation
    * distance `tPpm` (parts-per-million) of the GLOBAL sensitive
    * distribution is released (last-level fallback). l-diversity still
    * leaks through skew — a class with l distinct values where one
    * value holds 98% of the rows all but names it — so the criterion
    * must compare DISTRIBUTIONS, not distinct counts.
    *
    * The release test is division-cleared and exact: TV ≤ t/10⁶ ⟺
    * `Σ_v |cnt_cv·N − g_v·n_c| · 10⁶ ≤ 2·t·n_c·N`, evaluated in
    * DECIMAL(38,0) lanes (cnt·N reaches N², past BIGINT long before
    * the advertised scale); the reported per-class `tv_ppm` is the
    * same quantity floored to ppm. NULL sensitive values are excluded
    * (a NULL never equi-joins its own global cell — the caller maps
    * "unknown" to a real category if it should count).
    *
    * Scale shape per level: one shuffle to (class, v) cells; the
    * global distribution is a V-bounded aggregate of those cells; the
    * audit grid is classes × V via a broadcast of the V-row global
    * table (the q175/tvDrift benign class). Driver walk ≤ levels.size
    * bounded jobs, as in [[kAnonymize]].
    */
  def tCloseness(
      df: DataFrame,
      names: Seq[String],
      levels: Seq[Seq[Column]],
      sensitiveCol: Column,
      k: Long,
      tPpm: Long
  ): DataFrame = {
    require(levels.nonEmpty && k >= 1 && tPpm >= 0,
      "need at least one level, k >= 1 and tPpm >= 0")
    require(levels.forall(_.size == names.size),
      "every level must bind every quasi-identifier name")
    requireUniformLevelTypes(df, levels)
    val base = df.filter(sensitiveCol.isNotNull)
    val gv = base.groupBy(sensitiveCol.cast("string").as("__v"))
      .agg(count(lit(1)).as("__gv"))
    val total = gv.agg(sum(col("__gv")).as("__N"))
    def classesTv(lvl: Seq[Column]): DataFrame = {
      val cells = base
        .groupBy(lvl.zip(names).map { case (c, n) => c.as(n) } :+
          sensitiveCol.cast("string").as("__v"): _*)
        .agg(count(lit(1)).as("__cv"))
      val cls = cells.groupBy(names.map(col): _*).agg(sum(col("__cv")).as("n"))
      cls
        .crossJoin(broadcast(gv))                 // classes × V grid
        .join(cells, names :+ "__v", "left")
        .crossJoin(broadcast(total))
        .withColumn("__dev", expr(
          "abs(CAST(coalesce(__cv, 0) AS DECIMAL(38,0)) * __N" +
            " - CAST(__gv AS DECIMAL(38,0)) * n)"))
        .groupBy(names.map(col) :+ col("n"): _*)
        .agg(sum(col("__dev")).as("__num"), max(col("__N")).as("__N"))
        .withColumn("tv_ppm", expr(
          "CAST((__num * 1000000) DIV (CAST(2 AS DECIMAL(38,0)) * n * __N)" +
            " AS BIGINT)"))
        .withColumn("__pass", expr(
          s"n >= $k AND __num * 1000000 <= CAST(2 AS DECIMAL(38,0))" +
            s" * $tPpm * n * __N"))
    }
    val chosen = levels.indices
      .find(i => classesTv(levels(i)).filter(!col("__pass")).isEmpty)
      .getOrElse(levels.size - 1)
    classesTv(levels(chosen))
      .select(names.map(col) :+ col("n") :+ col("tv_ppm"): _*)
      .withColumn("level", lit(chosen.toLong))
  }

  /** Content manifest for a dataset export — the integrity artifact
    * shipped NEXT TO the data so any consumer, on any engine, can
    * verify the delivery without trusting file bytes: rows are
    * deterministically sharded by the portable md5 hash of their id,
    * and each shard reports its row count and the SUM of per-row
    * content fingerprints (order-independent, so a re-shuffled or
    * re-written copy of the same rows reproduces the manifest
    * exactly, while one flipped character in one row breaks its
    * shard's sum). Fingerprints are uint32 ([[graft.functions.Hashing
    * .md5Hash32]]), so the BIGINT sum cannot overflow below 2³¹ rows
    * per shard.
    *
    * Content is hashed as `id:content` — the fingerprint binds the
    * content to its key, so two rows SWAPPING contents changes the
    * manifest even though the content multiset is unchanged.
    *
    * Scale: pure map work + one ≤`nShards`-cell aggregate; no joins.
    */
  def contentManifest(
      df: DataFrame,
      idCol: Column,
      contentCol: Column,
      nShards: Int
  ): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    import graft.functions.Hashing
    df.select(idCol.cast("string").as("__id"),
        contentCol.cast("string").as("__c"))
      .withColumn("shard",
        pmod(Hashing.md5Hash32(0, col("__id")), lit(nShards.toLong)))
      .withColumn("fp",
        Hashing.md5Hash32(1, concat(col("__id"), lit(":"), col("__c"))))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), sum(col("fp")).as("content_sum"))
  }

  /** Join fan-out forecast — predict an equi-join's output size BEFORE
    * running it, from per-side key multiplicities: every matched key
    * contributes `n_left · n_right` rows, so two cheap count
    * aggregates + a count-table join price the whole thing. Output is
    * the top-`topK` keys by predicted contribution (desc, key asc —
    * total order) plus one `__total__` row with the matched-side sums
    * and the exact predicted row count. A single key predicting
    * millions of rows is the accidental-fanout (or accidental
    * self-join) caught for the cost of two aggregates instead of a
    * dead executor. Companion to [[shuffleBalance]], which prices the
    * shuffle; this prices the MATCH.
    *
    * Scale: per-side key counts (one shuffle each, map-side partial),
    * then everything runs on key-cardinality-sized tables; the top-K
    * is a TakeOrderedAndProject.
    */
  def joinFanout(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      topK: Int = 10
  ): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val lc = left.groupBy(leftKey.cast("string").as("key"))
      .agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(rightKey.cast("string").as("key"))
      .agg(count(lit(1)).as("n_right"))
    val matched = lc.join(rc, Seq("key"))
      .withColumn("out_rows", col("n_left") * col("n_right"))
    val top = matched.orderBy(col("out_rows").desc, col("key")).limit(topK)
    val total = matched
      .agg(coalesce(sum(col("n_left")), lit(0L)).as("n_left"),
        coalesce(sum(col("n_right")), lit(0L)).as("n_right"),
        coalesce(sum(col("out_rows")), lit(0L)).as("out_rows"))
      .select(lit("__total__").as("key"), col("n_left"), col("n_right"),
        col("out_rows"))
    top.unionByName(total)
  }

  /** Shuffle-balance forecast: how a planned shuffle on `keyCol` would
    * distribute over `buckets` reducers — per-bucket row and distinct-
    * key counts under the engine-portable md5 partitioner
    * ([[graft.functions.Hashing.md5Hash32]]), so a skewed key column
    * is caught by a CHEAP aggregate before the real job runs (and the
    * fix — salting, [[Skew]]; a different key; broadcast — is chosen
    * from evidence, not from a post-mortem). A hot bucket with
    * `n_keys = 1` is the salting case; a hot bucket with many keys is
    * hash-collision noise that more buckets dissolves.
    *
    * NULL keys are reported as their own `bucket = -1` row — every
    * engine sends them somewhere, and "somewhere" being 30% of the
    * table is exactly what this forecast exists to catch.
    *
    * Scale: one aggregate, ≤ buckets+1 cells shipped per task.
    */
  def shuffleBalance(df: DataFrame, keyCol: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    df.select(keyCol.cast("string").as("__k"))
      .withColumn("bucket",
        when(col("__k").isNull, lit(-1L))
          .otherwise(pmod(graft.functions.Hashing.md5Hash32(0, col("__k")),
            lit(buckets)).cast("long")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), count_distinct(col("__k")).as("n_keys"))
  }

  /** Benford first-digit audit — the classic fabricated-data /
    * broken-ETL smell test: naturally-occurring magnitudes follow
    * `P(d) = log₁₀(1 + 1/d)`, while synthesized, truncated, or
    * unit-mixed columns don't. One row per leading digit 1–9 with the
    * observed count/share and the deviation from Benford's law.
    *
    * Integer-exact cross-engine: values go through DECIMAL(18,2)→cents
    * (the house price convention — no double×100 ulp trap), the leading
    * digit is the first character of the decimal string (pure integer
    * rendering, no log10 on doubles), and the expected shares are the
    * INLINED floor(log₁₀(1+1/d)·10⁶) constants — the oracle carries
    * the same literals. Non-positive and NULL values are excluded (they
    * have no significant digit).
    *
    * Scale: one hash aggregate over a map-side digit projection — 9
    * cells per task.
    */
  def benfordAudit(df: DataFrame, valueCol: Column): DataFrame = {
    val expected = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
      66946L, 57991L, 51152L, 45757L)
    val expMap = expected.zipWithIndex
      .map { case (e, i) => (lit(i + 1L), lit(e)) }
      .flatMap { case (k, v) => Seq(k, v) }
    df.select(valueCol.cast("decimal(18,2)").as("__v"))
      .filter(col("__v") > 0)
      .select(substring((col("__v") * 100).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy("digit")
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("obs_ppm", expr("(n * 1000000) DIV __tot"))
      .withColumn("exp_ppm", element_at(map(expMap: _*), col("digit")))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .select("digit", "n", "obs_ppm", "exp_ppm", "dev_ppm")
  }
}
