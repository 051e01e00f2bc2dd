package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling is irreproducible across runs/engines; these
  * operators key the decision on a content hash, so the same row is
  * selected everywhere, every time — reproducible dataset splits, safe
  * re-runs, and cross-engine verifiability. Pure projections: zero
  * shuffle, linear at any scale.
  */
object Sampling {

  /** Hash of the key into [0, 10000) — basis points of the sample space. */
  private def bucket(keyCol: Column, seed: Int): Column =
    Hashing.md5Hash32(lit(seed), keyCol.cast("string")) % 10000

  /** Keep ~`fractionBp`/10000 of rows, decided by key hash (seeded). */
  def hashSample(df: DataFrame, keyCol: Column, fractionBp: Int, seed: Int = 1): DataFrame =
    df.filter(bucket(keyCol, seed) < fractionBp)

  /** The stratified-sample keep decision as a standalone boolean Column —
    * lets a pipeline carry the decision as a flag column (so one stats
    * aggregate covers every stage in a single pass, see
    * `jobs.CorpusCuration`) instead of filtering eagerly.
    * [[stratifiedHashSample]] is exactly `df.filter` of this expression.
    */
  def stratifiedKeepExpr(
      keyCol: Column,
      strataCol: Column,
      rates: Map[String, Int],
      defaultBp: Int = 0,
      seed: Int = 1
  ): Column = {
    val rateExpr = rates.foldLeft(lit(defaultBp)) { case (acc, (value, bp)) =>
      when(strataCol === value, lit(bp)).otherwise(acc)
    }
    bucket(keyCol, seed) < rateExpr
  }

  /** Per-stratum rates: `rates` maps stratum value → basis points; strata
    * not listed get `defaultBp`. The standard quality-weighted corpus
    * sampling shape (e.g. keep 100% of high-quality docs, 5% of the rest).
    */
  def stratifiedHashSample(
      df: DataFrame,
      keyCol: Column,
      strataCol: Column,
      rates: Map[String, Int],
      defaultBp: Int = 0,
      seed: Int = 1
  ): DataFrame =
    df.filter(stratifiedKeepExpr(keyCol, strataCol, rates, defaultBp, seed))

  /** Mixture weighting: resample each source to its target weight, in
    * milli-multiples (1000 = keep as-is, 500 = downsample to half, 2500 =
    * upsample 2.5×). A row with weight w emits `w div 1000` full copies
    * plus one more with probability `(w mod 1000)/1000`, decided by the
    * key hash — the deterministic version of the per-source temperature /
    * mixture sampling every pretraining data pipeline runs. Output adds
    * `copy` (1-based repetition index) so downstream shuffling can spread
    * the copies. Pure projection + generator: zero shuffle, linear at any
    * scale.
    */
  def mixtureSample(
      df: DataFrame,
      keyCol: Column,
      sourceCol: Column,
      weightsMilli: Map[String, Int],
      defaultMilli: Int = 1000,
      seed: Int = 3
  ): DataFrame = {
    val wExpr = weightsMilli.foldLeft(lit(defaultMilli)) { case (acc, (value, w)) =>
      when(sourceCol === value, lit(w)).otherwise(acc)
    }
    resampleByWeight(df, keyCol, wExpr, seed)
  }

  /** The resample core shared by [[mixtureSample]] and
    * [[temperatureResample]]: a row with milli-weight w emits `w div
    * 1000` full copies plus one more with probability `(w mod 1000)/
    * 1000`, decided by the seeded key hash. Pure projection + generator:
    * zero shuffle.
    */
  private def resampleByWeight(
      df: DataFrame, keyCol: Column, weightMilli: Column, seed: Int): DataFrame =
    df.withColumn("__n",
        (weightMilli / 1000).cast("long") +
          when(bucket(keyCol, seed) < (weightMilli % 1000) * 10, 1L).otherwise(0L))
      .filter(col("__n") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("__n"))))
      .drop("__n")

  /** α = 0.5 temperature weights computed FROM the corpus — the
    * multinomial source-rebalancing of multilingual pretraining (XLM-R,
    * Conneau et al. 2020 §3.1; mC4): resample so source s's share is
    * ∝ count_s^α instead of count_s, flattening the head without
    * discarding the tail. Returns `(source, weight_milli)` sized so the
    * EXPECTED total row count is preserved (rare sources upsample above
    * 1000, dominant ones downsample below).
    *
    * Integer-exact for cross-engine verification: isqrt via float-sqrt
    * + TWO-SIDED correction — above 2⁵² the long→double conversion can
    * land floor(sqrt) one off in EITHER direction, so both a downward
    * and an upward step are checked (exact for counts < 2⁶²; one-sided
    * correction is only exact to ~2⁵²) — then ONE floor division
    * computed in DECIMAL(38,0) so the product 1000·√c·total cannot
    * overflow at any realistic corpus size.
    *
    * Scale shape: one map-side-combined count per source (the only
    * shuffle), a single-row global total crossed back in — weight table
    * cardinality = |sources|, broadcast downstream.
    */
  def temperatureMilliWeights(df: DataFrame, sourceCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(sourceCol.as("source")).agg(count(lit(1)).as("c"))
    val f = floor(sqrt(col("c").cast("double"))).cast("long")
    val withS = counts.withColumn("s",
      when(f * f > col("c"), f - 1)
        .when((f + 1) * (f + 1) <= col("c"), f + 1)
        .otherwise(f))
    // expected "WindowExec: No Partition Defined" warning at runtime: the
    // totals window runs over the |sources|-row weight table, never the
    // corpus — a separate `.agg` + crossJoin would instead re-execute the
    // corpus count lineage a second time (Spark does not dedupe common
    // subplans across DataFrame branches)
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    withS
      .withColumn("total", sum("c").over(w))
      .withColumn("sum_s", sum("s").over(w))
      .withColumn("weight_milli",
        expr("(CAST(1000 AS DECIMAL(38,0)) * s * total) DIV (CAST(c AS DECIMAL(38,0)) * sum_s)"))
      .select(col("source"), col("weight_milli"))
  }

  /** Temperature resampling end to end: [[temperatureMilliWeights]]
    * joined back (broadcast, null-safe on the source key) and applied
    * through the same deterministic copy generator as [[mixtureSample]].
    * Output keeps `weight_milli` and adds `copy` (1-based repetition
    * index). Two passes over the input by design — the weight scan and
    * the resample scan — because the weights depend on global counts;
    * cache the input if it is expensive to recompute.
    */
  def temperatureResample(
      df: DataFrame,
      keyCol: Column,
      sourceCol: Column,
      seed: Int = 3
  ): DataFrame = {
    val w = temperatureMilliWeights(df, sourceCol).withColumnRenamed("source", "__src")
    resampleByWeight(
      df.join(broadcast(w), sourceCol <=> col("__src")),
      keyCol, col("weight_milli"), seed)
      .drop("__src")
  }

  /** Per-key cap: keep at most `n` rows per key, selected by seeded
    * content-hash order — the per-source / per-domain document cap every
    * corpus-balancing pass applies (a few template-heavy domains
    * otherwise dominate a crawl). Hash ordering makes the kept set a
    * uniform deterministic n-subset per key — reproducible across runs,
    * engines, and partitionings; ties (hash collisions) break on the id
    * so the result is total-order stable. PRECONDITION: `idCol` is
    * unique per row (run dedup first) — duplicate (key, id) pairs get
    * identical sort keys, making which physical row survives the cap
    * partition-dependent.
    *
    * Scale shape: `row_number ≤ n` over the (key, hash) window is
    * rewritten by Spark's `InferWindowGroupLimit` into a PARTIAL
    * `WindowGroupLimit` before the shuffle and a FINAL one after — each
    * map task pre-prunes to n rows per key before anything ships, so a
    * hot key shuffles ~n·tasks rows, never its full group, and the
    * post-shuffle sort sees the pruned stream (spec-pinned plan). That
    * bounded-by-construction profile is why this stays a window and
    * does not need the groupBy-min reformulation the dedup family uses
    * for its (unbounded) window aggregates.
    */
  def capPerKey(df: DataFrame, keyCol: Column, idCol: Column, n: Int,
                seed: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol)
      .orderBy(Hashing.md5Hash32(lit(seed), idCol.cast("string")), idCol)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Weighted sample without replacement of exactly `k` rows, by
    * PRIORITY SAMPLING order (Duffield et al.): each row's priority is
    * `u / w` with `u` a 32-bit key hash (fixed-granularity uniform) and
    * `w` its weight — the `k` lowest priorities are the sample.
    * Weight-monotone, with the u/w pairwise law: for `w_A ≥ w_B`,
    * `P(A before B) = 1 − w_B/(2·w_A)` (so 2× weight gives 3:1 odds,
    * 1:1 → 3:1, NOT a doubled probability — the exactly-proportional
    * variant needs exponential variates, Efraimidis–Spirakis `u^(1/w)`,
    * which trades away integer exactness). All-integer
    * (`hash·10⁶ div weight_ppm`), so the
    * selected set is bit-reproducible across runs, engines, and
    * partitionings — none of which holds for `rand()`-based weighted
    * sampling. Null/non-positive weights never sample. The row's
    * `priority` is kept in the output for auditability.
    *
    * Scale shape: one scan + a distributed TakeOrdered (per-partition
    * top-k, then a k·partitions merge on the driver) — no global sort,
    * no shuffle of the corpus.
    */
  /** The ONE definition of the integer priority (`hash·10⁶ div weight`),
    * shared by the global and per-stratum draws so their q133/q147
    * oracles can never drift apart (the `qualityPpmSql` rule applied to
    * Scala).
    */
  private def withPriority(df: DataFrame, idCol: Column,
                           weightPpmCol: Column, seed: Int): DataFrame =
    df.filter(weightPpmCol.isNotNull && weightPpmCol > 0)
      .withColumn("__w", weightPpmCol.cast("long"))
      .withColumn("__num",
        Hashing.md5Hash32(lit(seed), idCol.cast("string")) * lit(1000000L))
      .withColumn("priority", expr("CAST(__num DIV __w AS BIGINT)"))
      .drop("__w", "__num")

  def weightedPrioritySample(
      df: DataFrame,
      idCol: Column,
      weightPpmCol: Column,
      k: Int,
      seed: Int = 3
  ): DataFrame =
    withPriority(df, idCol, weightPpmCol, seed)
      .orderBy(col("priority"), idCol)
      .limit(k)

  /** Per-stratum weighted sample without replacement:
    * [[weightedPrioritySample]]'s integer hash/weight priority order
    * applied independently inside every stratum — `k` winners per key,
    * so one giant stratum can't crowd the small ones out of a balanced
    * draw (the per-key twin, exactly as [[capPerKey]] is the per-key
    * twin of [[hashSample]]).
    *
    * Scale: the per-key rank plans as `WindowGroupLimit`, so each task
    * prunes to its local top-k per key BEFORE the shuffle — a hot
    * stratum ships ~k·tasks rows, never its full population.
    */
  def weightedPrioritySamplePerKey(
      df: DataFrame,
      keyCol: Column,
      idCol: Column,
      weightPpmCol: Column,
      k: Int,
      seed: Int = 3
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("priority"), idCol)
    withPriority(df, idCol, weightPpmCol, seed)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .drop("rnk")
  }

  /** Highest-value subset under a global token budget — the data-selection
    * step of a budgeted pretraining run: greedily take documents in
    * (score DESC, key-hash, id) order until `budget` tokens are spent; a
    * document is kept iff some budget remains BEFORE it (so the total may
    * overshoot by at most one document). The hash tie-break makes the
    * within-score selection a uniform deterministic subset, not an
    * id-prefix.
    *
    * NOT implemented as one global ordered cumulative sum — over an
    * unpartitioned window that is a single-task sort, the classic
    * scale-killer. Two-phase instead:
    *   1. per-score-class token histogram (one map-combined shuffle;
    *      cardinality ≤ |distinct scores|, ≤ 1e6 for ppm-scaled scores);
    *   2. exclusive running totals over that TINY histogram mark each
    *      class keep/drop, leaving exactly ONE boundary class whose
    *      members get the per-document decision — a window partitioned
    *      by that single score value, touching only its members.
    * Equivalent row-for-row to the global-window formulation (the oracle
    * runs that form), but every big-data stage stays partition-parallel.
    * The boundary window does land one score class on one task — bounded
    * by the largest single-score cohort; salt the score into sub-classes
    * first if one value dominates the corpus.
    *
    * Precondition: `scoreCol` non-null (Spark orders null scores last
    * under DESC, other engines first — filter or coalesce them first),
    * `idCol` unique, `tokensCol ≥ 0`.
    */
  def selectTokenBudget(
      df: DataFrame,
      idCol: Column,
      scoreCol: Column,
      tokensCol: Column,
      budget: Long,
      seed: Int = 5
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.withColumn("__score", scoreCol)
      .withColumn("__tok", tokensCol.cast("long"))
      .withColumn("__h", Hashing.md5Hash32(lit(seed), idCol.cast("string")))
    val hist = base.groupBy(col("__score")).agg(sum(col("__tok")).as("__cls_tok"))
    // expected "WindowExec: No Partition Defined" warning at runtime: this
    // window runs over the per-score histogram (bounded cardinality, see
    // scaladoc), never the corpus
    val wS = Window.orderBy(col("__score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // localCheckpoint: the TINY cumulative table feeds two branches
    // (keep-classes and the boundary class); without the checkpoint each
    // branch re-executes the corpus histogram scan (Spark does not dedupe
    // common subplans), doubling the most expensive stage
    val cum = hist.withColumn("__before",
        coalesce(sum(col("__cls_tok")).over(wS), lit(0L)))
      .localCheckpoint(false)
    val keepCls = cum.filter(col("__before") + col("__cls_tok") < budget)
      .select(col("__score"))
    val boundCls = cum.filter(col("__before") < budget &&
        col("__before") + col("__cls_tok") >= budget)
      .select(col("__score"), col("__before"))
    val keptFull = base.join(broadcast(keepCls), Seq("__score"))
    val wB = Window.partitionBy(col("__score")).orderBy(col("__h"), idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val keptBoundary = base.join(broadcast(boundCls), Seq("__score"))
      .withColumn("__excl",
        col("__before") + coalesce(sum(col("__tok")).over(wB), lit(0L)))
      .filter(col("__excl") < budget)
      .drop("__excl", "__before")
    keptFull.unionByName(keptBoundary).drop("__score", "__tok", "__h")
  }

  /** DSIR importance resampling end to end: [[TextOps.importanceWeights]]
    * (how target-like each document's bigram statistics are) joined back
    * — LEFT, so documents with no bigrams (< 2 tokens) resample at the
    * neutral 1000 — and applied through the same deterministic copy
    * generator as [[mixtureSample]]. Output keeps `weight_milli` and
    * adds `copy`.
    */
  def importanceResample(
      docs: DataFrame,
      target: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      seed: Int = 3
  ): DataFrame = {
    val w = TextOps.importanceWeights(docs, target, idCol, textCol)
      .withColumnRenamed(idCol, "__wid")
    // plain equi-join: the weight table is one row PER CORPUS DOCUMENT
    // (unlike temperatureResample's |sources| rows) — never broadcast it
    resampleByWeight(
      docs.join(w, col(idCol) === col("__wid"), "left")
        .withColumn("weight_milli", coalesce(col("weight_milli"), lit(1000L))),
      col(idCol), col("weight_milli"), seed)
      .drop("__wid")
  }

  /** [[selectTokenBudget]] with an independent budget PER STRATUM (the
    * per-language token caps of a multilingual data mix: "at most N
    * billion tokens of each language, best-first"). Same greedy
    * semantics within each stratum — (score DESC, hash, id) order, keep
    * while that stratum's budget has room — and the same two-phase
    * decomposition, except nothing here is ever unpartitioned: the
    * histogram groups by (stratum, score), the cumulative pass windows
    * per stratum over the tiny histogram, and the boundary window runs
    * per (stratum, boundary-score). Strata absent from `budgets` get
    * `defaultBudget`.
    *
    * Preconditions as [[selectTokenBudget]]. NULL strata are first-class:
    * they group, window, and join null-safely as their own stratum under
    * `defaultBudget` (matching [[temperatureResample]]'s null-source
    * handling) — an equi-join here would silently drop every null-stratum
    * document while a plain-window oracle formulation keeps them.
    */
  def selectTokenBudgetPerKey(
      df: DataFrame,
      idCol: Column,
      strataCol: Column,
      scoreCol: Column,
      tokensCol: Column,
      budgets: Map[String, Long],
      defaultBudget: Long,
      seed: Int = 5
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budgetExpr = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (k, b)) => when(col("__strata") === k, lit(b)).otherwise(acc)
    }
    val base = df.withColumn("__strata", strataCol)
      .withColumn("__score", scoreCol)
      .withColumn("__tok", tokensCol.cast("long"))
      .withColumn("__h", Hashing.md5Hash32(lit(seed), idCol.cast("string")))
    val hist = base.groupBy(col("__strata"), col("__score"))
      .agg(sum(col("__tok")).as("__cls_tok"))
    val wS = Window.partitionBy(col("__strata")).orderBy(col("__score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // same shared-lineage checkpoint as selectTokenBudget: the tiny
    // cumulative table feeds both class branches
    val cum = hist
      .withColumn("__before", coalesce(sum(col("__cls_tok")).over(wS), lit(0L)))
      .withColumn("__budget", budgetExpr)
      .localCheckpoint(false)
    val keepCls = cum.filter(col("__before") + col("__cls_tok") < col("__budget"))
      .select(col("__strata").as("__ks"), col("__score").as("__kc"))
    val boundCls = cum.filter(col("__before") < col("__budget") &&
        col("__before") + col("__cls_tok") >= col("__budget"))
      .select(col("__strata").as("__bs"), col("__score").as("__bc"),
        col("__before"), col("__budget"))
    val keptFull = base.join(broadcast(keepCls),
        col("__strata") <=> col("__ks") && col("__score") === col("__kc"))
      .drop("__ks", "__kc")
    val wB = Window.partitionBy(col("__strata"), col("__score"))
      .orderBy(col("__h"), idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val keptBoundary = base.join(broadcast(boundCls),
        col("__strata") <=> col("__bs") && col("__score") === col("__bc"))
      .drop("__bs", "__bc")
      .withColumn("__excl",
        col("__before") + coalesce(sum(col("__tok")).over(wB), lit(0L)))
      .filter(col("__excl") < col("__budget"))
      .drop("__excl", "__before", "__budget")
    keptFull.unionByName(keptBoundary)
      .drop("__strata", "__score", "__tok", "__h")
  }

  /** Deterministic train/validation/test split tag from the key hash.
    * Default seed differs from [[hashSample]]'s: with the same seed the
    * split would correlate with the sampling filter (every sampled row
    * would land in "train" — the buckets are the same numbers).
    */
  def splitTag(keyCol: Column, trainBp: Int = 9000, validBp: Int = 500, seed: Int = 2): Column = {
    val b = bucket(keyCol, seed)
    when(b < trainBp, "train")
      .when(b < trainBp + validBp, "valid")
      .otherwise("test")
  }

  /** Deterministic negative sampling for contrastive/recommendation
    * training: for every user in `positives`, up to `k` items drawn
    * uniformly-by-hash from the observed item universe that the user
    * has NO positive interaction with — the `(user, negative)` half of
    * a training pair, reproducible run-to-run (same hash family as
    * every sampler here, [[graft.functions.Hashing.md5Hash32]]).
    *
    * Algorithm: the distinct item universe is densely indexed
    * `[0, U)`; candidate `j ∈ [0, k·oversample)` for a user maps to
    * index `h_j(user) mod U`; candidates that hit a positive are
    * anti-joined away, hash-collision duplicates keep their smallest
    * `j`, and the survivors rank by `j` with the first `k` kept —
    * so `rank` is also the deterministic tie-break order. Best-effort
    * by construction: a user whose positives cover most of the
    * universe (or unlucky collisions) can get fewer than `k` negatives
    * — raise `oversample` rather than looping (P(short) decays
    * geometrically with the oversample factor).
    *
    * Scale shape: distinct-items aggregate → dense index (row_number
    * over the ITEM VOCABULARY — the bounded-NDV trade of
    * [[graft.ext.TextOps.oovStats]]'s vocab table: catalogs are
    * thousands-to-millions, not corpus-sized), broadcast back onto a
    * users×oversample generator, one `(user, item)` anti-join shuffle
    * against positives, one per-user window for the rank. Everything
    * else is map-side.
    */
  /** Proportional sample allocation with EXACT total — how many rows to
    * draw from each stratum so the quotas sum to EXACTLY `budget`
    * (floor-and-distribute / largest remainder, the q248 credit rule
    * applied to allocation): each stratum gets `⌊budget·n_s / N⌋`, and
    * the `budget mod` leftover slots go one each to the largest
    * remainders `pmod(budget·n_s, N)` (ties to the larger stratum, then
    * key order — total). Pure proportional flooring under-allocates by
    * up to |strata| rows and a naive round() over-allocates past the
    * budget; this rule is why Σquota = min(budget, N) is an invariant a
    * sampler can assert, not hope for. Quotas cap at the stratum's
    * population (you cannot draw 50 from 30) — and the cap provably
    * only binds when `budget ≥ N` (for `budget ≤ N`,
    * `⌊budget·n/N⌋ + 1 > n` would need `budget > N`), where every
    * stratum saturates anyway, so no redistribution pass exists.
    *
    * Pairs with [[capPerKey]] to EXECUTE the draw. Scale: one shuffle
    * to stratum counts; everything after runs on the |strata|-bounded
    * table (window over bounded cells — the q230 benign class).
    */
  def proportionalAllocation(
      df: DataFrame,
      strataCol: Column,
      budget: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, "budget must be non-negative")
    val counts = df.filter(strataCol.isNotNull)
      .groupBy(strataCol.as("stratum")).agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy()
    val wRem = Window.partitionBy().orderBy(
      expr(s"pmod($budget * n, __total)").desc, col("n").desc, col("stratum"))
    counts
      .withColumn("__total", sum(col("n")).over(wAll))
      .withColumn("__floor", expr(s"($budget * n) DIV __total"))
      .withColumn("__extra", expr(s"$budget - sum(__floor) OVER ()"))
      .withColumn("__rk", row_number().over(wRem))
      .withColumn("quota",
        least(col("n"),
          col("__floor") + when(col("__rk") <= col("__extra"), 1L).otherwise(0L)))
      .select(col("stratum"), col("n"), col("quota"))
  }

  /** EXECUTE a [[proportionalAllocation]] plan: draw exactly each
    * stratum's quota by deterministic hash rank (md5 order, id
    * tiebreak — reproducible on any engine and in the oracle), so the
    * sample size is exactly `min(budget, N)` BY CONSTRUCTION, end to
    * end from plan to rows. This is uniform-without-replacement within
    * each stratum under the usual hash-as-randomness assumption — the
    * same contract as [[hashSample]], but with exact COUNTS instead of
    * exact rates.
    *
    * Scale: quota table broadcast (|strata| rows); the rank is a
    * per-stratum sort-based window. The quota is a runtime column, so
    * `WindowGroupLimit` cannot prune the sort map-side (it needs a
    * literal) — per-stratum sorting is the honest cost; pre-filter
    * with [[hashSample]] at a few × the target rate first when strata
    * are huge.
    */
  def allocatedSample(
      df: DataFrame,
      strataCol: Column,
      idCol: Column,
      budget: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quotas = proportionalAllocation(df, strataCol, budget)
      .select(col("stratum"), col("quota"))
    val ranked = df.filter(strataCol.isNotNull)
      .select(strataCol.as("stratum"), idCol.as("id"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("stratum")).orderBy(
          graft.functions.Hashing.md5Hash32(5, col("id").cast("string")),
          col("id"))))
    ranked.join(broadcast(quotas), Seq("stratum"))
      .filter(col("__rk") <= col("quota"))
      .select(col("stratum"), col("id"))
  }

  def negativeSamples(
      positives: DataFrame,
      userCol: String,
      itemCol: String,
      k: Int,
      oversample: Int = 4,
      seedBase: Int = 11
  ): DataFrame = {
    require(k > 0 && oversample > 0, "k and oversample must be positive")
    val pos = positives
      .select(col(userCol).as("user"), col(itemCol).as("item"))
      .filter(col("user").isNotNull && col("item").isNotNull)
      .distinct()
    val items = pos.select(col("item")).distinct()
      .withColumn("__idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("item"))).cast("long") - 1)
    // universe size as a one-row broadcast so the candidate index is
    // computed MAP-SIDE and the item lookup stays an equi hash join (a
    // modulo inside the join condition would plan a nested loop)
    val uRow = items.agg(count(lit(1)).as("__u"))
    val mapped = pos.select(col("user")).distinct()
      .crossJoin(broadcast(uRow))
      .select(col("user"), col("__u"),
        explode(sequence(lit(0), lit(k * oversample - 1))).as("j"))
      .withColumn("__idx",
        Hashing.md5Hash32(lit(seedBase) * 1000 + col("j"), col("user"))
          % col("__u"))
      .join(broadcast(items), Seq("__idx"))
      .select(col("user"), col("item"), col("j"))
    mapped
      .join(pos, Seq("user", "item"), "left_anti")
      .groupBy("user", "item")
      .agg(min(col("j")).as("__j"))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user")).orderBy(col("__j"), col("item")))
          .cast("long"))
      .filter(col("rank") <= k)
      .select("user", "item", "rank")
  }
}
