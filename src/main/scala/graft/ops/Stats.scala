package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution statistics beyond the plain aggregate surface (the
  * reference has only COUNT/AVG — `PythonKafkaSink/main.py:82,94` — so
  * these are engine extensions): fixed-width histograms and exact
  * correlation components.
  *
  * Everything is a single hash-aggregate shuffle over the fact table —
  * the same plan shape as a `groupBy().count()`, so it scales to any
  * corpus size without special handling.
  */
object Stats {

  /** Fixed-width histogram of `value`: one row per occupied bin with the
    * bin's inclusive lower bound and the row count. `floor(v / width)`
    * bins exactly like SQL's `width_bucket` over a zero-anchored grid but
    * stays integer-exact cross-engine (width_bucket's bounds arithmetic
    * is double-typed). Empty bins are absent — at 100 TB the occupied-bin
    * set is what fits in memory, not the value range.
    */
  def histogram(df: DataFrame, value: Column, width: Long): DataFrame = {
    require(width > 0, s"bin width must be positive, got $width")
    df.groupBy(floor(value / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", (col("bin") * width).cast("long"))
  }

  /** Pearson correlation from exact decimal component sums (n, Σx, Σy,
    * Σxy, Σx², Σy²) — decimal addition is associative, so the sums are
    * order-independent and identical across engines/partitionings, unlike
    * a streaming double `corr()`.
    *
    * The product sums are emitted as BIGINT in 10⁻⁴ units (`*_e4`), not
    * as doubles: their unscaled decimal values exceed 2^53, where a
    * DECIMAL→DOUBLE cast is no longer exact and engines legitimately
    * disagree by 1 ulp (int128→double then ÷10⁴ double-rounds; a
    * BigDecimal cast rounds once — observed on the fixtures). Integers
    * compare bit-exact; BIGINT headroom runs out when Σy²·10⁴ nears
    * 9.2e18 — at that scale emit coarser units. `corr6` is a fixed IEEE
    * expression over bit-identical inputs, so it is engine-exact before
    * its final round(6).
    */
  def corrComponents(df: DataFrame, groupCol: Column, x: Column, y: Column): DataFrame = {
    val dec2 = DecimalType(18, 2)
    val dec4 = DecimalType(38, 4)
    val xd = x.cast(dec2)
    val yd = y.cast(dec2)
    val agg = df.groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        sum(xd).cast("double").as("sum_x"),
        sum(yd).cast("double").as("sum_y"),
        (sum((xd * yd).cast(dec4)) * 10000).cast("long").as("sum_xy_e4"),
        (sum((xd * xd).cast(dec4)) * 10000).cast("long").as("sum_x2_e4"),
        (sum((yd * yd).cast(dec4)) * 10000).cast("long").as("sum_y2_e4"))
    val n = col("n").cast("double")
    def e4(c: String): Column = col(c).cast("double") * 1e-4
    val cov = n * e4("sum_xy_e4") - col("sum_x") * col("sum_y")
    val vx = n * e4("sum_x2_e4") - col("sum_x") * col("sum_x")
    val vy = n * e4("sum_y2_e4") - col("sum_y") * col("sum_y")
    agg.withColumn("corr6", round(cov / (sqrt(vx) * sqrt(vy)), 6))
  }

  /** Spearman rank correlation per key, EXACT end to end — the
    * monotone-association twin of [[corrComponents]] (Pearson answers
    * "linear in the raw units"; Spearman answers "monotone at all",
    * robust to outliers and any monotone rescaling). Ranks are
    * tie-AVERAGED and carried as doubled integers (`2·rank + t − 1`
    * for a tie run of `t` — twice the average rank, always integral),
    * so every component sum is integer and the result is the signed
    * squared correlation in ppm: `rho2_signed_ppm =
    * sign(cov) · cov² · 10⁶ DIV (varx · vary)` over DECIMAL(38,0)
    * lanes — no square root, no IEEE boundary (the q250 chi-square
    * idiom; `sign·ρ²` preserves both strength and direction and is
    * monotone in ρ). Degenerate variance (a constant side) reports
    * NULL — undefined, not zero.
    *
    * Exactness bound: `cov²` worst-cases at n⁸/9, leaving
    * DECIMAL(38,0) around n ≈ 3·10⁴ per key — guarded EXPLICITLY
    * (`n ≤ 30000` or NULL, deterministic on both engines, the
    * documented [[abChiSquare]] pattern). The ppm scaling uses the
    * exact two-step decomposition `floor(x·10⁶/D) = q₃·10³ +
    * floor((x·10³ mod D)·10³/D)` (q₃ = floor(x·10³/D)) so the ×10⁶
    * never materializes — a direct `cov²·10⁶` would shrink the bound
    * to n ≈ 10⁴. Above the bound, rank correlation belongs on a
    * deterministic sample ([[graft.ext.Sampling]]) — at that n the
    * estimate is already ±0.6% at 95% confidence.
    *
    * Scale: ranks come from [[cumHistByKey]] cells (hash aggregates +
    * cell-grain windows/joins) — no per-key sort window anywhere, so a
    * dominant key never routes its slice through one reducer.
    */
  def spearman(
      df: DataFrame,
      keyCol: Column,
      xCol: Column,
      yCol: Column
  ): DataFrame = {
    val base = df.select(keyCol.as("key"), xCol.cast("long").as("x"),
        yCol.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    // Ranks off [[cumHistByKey]] cells instead of two
    // `Window.partitionBy(key).orderBy(side)` rank passes: a value
    // cell's doubled tie-averaged rank is 2·rank + ties − 1 =
    // 2·__ce − __c + 1, constant for every row of the cell, so each
    // side's ranks join back at CELL grain onto the (key, x, y) pair
    // cells and every component sum folds as count·term — bit-identical
    // to the row-grain window sums (StatsSpec pins it). A dominant key
    // costs hash aggregates, cell-grain windows and cell-grain joins,
    // never a corpus-grain single-reducer sort (guide §2.5 — the
    // q128/q279 swap, applied to the test family).
    val pairs = base.groupBy("key", "x", "y").agg(count(lit(1)).as("__c"))
    // ONE keyed-histogram pass serves BOTH sides: x and y rows stack
    // under a side flag folded into the histogram key (struct grouping
    // and the <=> join treat a null key field as a value, matching
    // groupBy semantics), so the fixed machinery — range partition,
    // offsets walk, cum window — runs once over 2n rows instead of
    // twice over n
    val stacked = base
      .select(col("key"), lit(true).as("__sx"), col("x").as("__sv"))
      .unionByName(base
        .select(col("key"), lit(false).as("__sx"), col("y").as("__sv")))
    val cells2 = cumHistByKey(stacked,
        struct(col("key"), col("__sx")), col("__sv"))
      .select(col("__k.key").as("__ck"), col("__k.__sx").as("__cx"),
        col("__v"), (lit(2L) * col("__ce") - col("__c") + lit(1L)).as("__r2"))
    def sideRanks(isX: Boolean, rk: String): DataFrame =
      cells2.filter(if (isX) col("__cx") else !col("__cx"))
        .select(col("__ck").as(s"__${rk}k"), col("__v").as(s"__${rk}v"),
          col("__r2").as(rk))
    pairs
      .join(sideRanks(isX = true, "rx"),
        col("key") <=> col("__rxk") && col("x") === col("__rxv"))
      .join(sideRanks(isX = false, "ry"),
        col("key") <=> col("__ryk") && col("y") === col("__ryv"))
      .groupBy("key")
      .agg(sum(col("__c")).as("n"),
        sum(col("__c") * col("rx")).as("sx"),
        sum(col("__c") * col("ry")).as("sy"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * rx * ry")).as("sxy"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * rx * rx")).as("sxx"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * ry * ry")).as("syy"))
      .withColumn("__cov", expr(
        "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("__vx", expr(
        "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("__vy", expr(
        "CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .withColumn("__c2", expr("__cov * __cov"))
      .withColumn("__d", expr("__vx * __vy"))
      .withColumn("rho2_signed_ppm", expr(
        "CASE WHEN n <= 30000 AND __vx > 0 AND __vy > 0 THEN " +
          "CAST(CASE WHEN __cov < 0 THEN -1 ELSE 1 END" +
          " * (((__c2 * 1000) DIV __d) * 1000" +
          "    + (((__c2 * 1000) % __d) * 1000) DIV __d) AS BIGINT)" +
          " END"))
      .select(col("key"), col("n"), col("rho2_signed_ppm"))
  }

  /** Mann–Whitney U per key, EXACT — the nonparametric two-sample test
    * ([[abChiSquare]] compares conversion RATES; this compares whole
    * VALUE DISTRIBUTIONS without a normality assumption — the right
    * readout when the metric is skewed, e.g. revenue or latency).
    * Values pool per key, ranks tie-average as doubled integers
    * (`2·rank + t − 1`, the [[spearman]] convention), and
    * `2U_b = 2R_b − n_b·(n_b+1)` stays integral throughout
    * (`2R_b` = group-b doubled rank sum; U_b counts b-beats-a pairs,
    * ties half each).
    *
    * Significance is the cleared z-test at α = 0.05: `|U − n_a·n_b/2|
    * > 1.96·√(n_a·n_b·(n+1)/12)` ⟺ `(2U − n_a·n_b)²·30000 >
    * 38416·n_a·n_b·(n+1)`, all in DECIMAL(38,0)/HUGEINT lanes — no
    * square root, no IEEE boundary (uncorrected-for-ties variance:
    * the standard form; heavy ties make it conservative). Effect size
    * is the rank-biserial correlation in ppm, `(2U − n_a·n_b)·10⁶ DIV
    * (n_a·n_b)` (signed truncation toward zero on both engines). A
    * key missing either group reports NULLs — the test is undefined.
    *
    * Overflow headroom: `(2U − n_a·n_b)²·3·10⁴ ≤ n⁴·10⁴` fits
    * DECIMAL(38,0) to n ≈ 3·10⁸ rows per key — beyond per-key scales
    * where the z-approximation is already exact for practical
    * purposes.
    *
    * Scale: rank sums come from [[cumHist2ByKey]] cells (hash
    * aggregates + cell-grain windows) — no per-key sort window, so a
    * dominant key never routes its slice through one reducer.
    */
  def mannWhitney(
      df: DataFrame,
      keyCol: Column,
      inGroupBCol: Column,
      valueCol: Column
  ): DataFrame = {
    val base = df.select(keyCol.as("key"), inGroupBCol.cast("boolean").as("b"),
        valueCol.cast("long").as("v"))
      .filter(col("b").isNotNull && col("v").isNotNull)
    // per-(key, value) cells off the keyed two-group histogram instead
    // of a `Window.partitionBy(key).orderBy(v)` rank pass: a cell's
    // doubled tie-averaged rank is 2·rank + ties − 1 with
    // rank = (total exclusive cum) + 1 and ties = the cell count, i.e.
    // 2·(cea+ceb) − (ca+cb) + 1 — summed over group-b rows as
    // cb · r2 per cell. Bit-identical to the window formulation
    // (StatsSpec pins it); a dominant key costs hash aggregates and
    // cell-grain windows, never a corpus-grain single-reducer sort
    // (guide §2.5 — the q128/q279 swap, applied to the test family).
    cumHist2ByKey(base, col("key"), col("v"), col("b"))
      .groupBy(col("__k").as("key"))
      .agg(
        max(col("__na")).as("n_a"),
        max(col("__nb")).as("n_b"),
        sum(col("__cb") * (lit(2L) * (col("__cea") + col("__ceb"))
          - (col("__ca") + col("__cb")) + lit(1L))).as("__r2b"))
      .withColumn("u2_b", expr(
        "CASE WHEN n_a > 0 AND n_b > 0 THEN" +
          " __r2b - n_b * (n_b + 1) END"))
      .withColumn("rank_biserial_ppm", expr(
        "CASE WHEN n_a > 0 AND n_b > 0 THEN" +
          " CAST((CAST(u2_b AS DECIMAL(38,0)) - CAST(n_a AS DECIMAL(38,0)) * n_b)" +
          " * 1000000 DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) END"))
      .withColumn("significant", expr(
        "CASE WHEN n_a > 0 AND n_b > 0 THEN" +
          " (CAST(u2_b AS DECIMAL(38,0)) - CAST(n_a AS DECIMAL(38,0)) * n_b)" +
          " * (CAST(u2_b AS DECIMAL(38,0)) - CAST(n_a AS DECIMAL(38,0)) * n_b)" +
          " * 30000 > CAST(38416 AS DECIMAL(38,0)) * n_a * n_b * (n_a + n_b + 1)" +
          " END"))
      .select(col("key"), col("n_a"), col("n_b"), col("u2_b"),
        col("rank_biserial_ppm"), col("significant"))
  }

  /** Kolmogorov–Smirnov two-sample test per key, EXACT — the
    * shape-sensitive companion to [[mannWhitney]] (MW sees location
    * shifts; KS sees ANY distributional difference — equal medians
    * with different variances, bimodality, tail weight). The statistic
    * is the max ECDF gap over the pooled values, carried as the
    * integer numerator `D_num = max_v |cum_a(v)·n_b − cum_b(v)·n_a|`
    * (D = D_num/(n_a·n_b)); cumulative counts are the inclusive
    * per-cell cumulatives of the keyed two-group histogram
    * ([[cumHist2ByKey]] — tie values ARE one cell), matching the
    * RANGE-frame window semantics the oracle evaluates per row.
    *
    * Significance is the cleared large-sample test at α = 0.05
    * (critical value 1.358): `D > 1.358·√((n_a+n_b)/(n_a·n_b))` ⟺
    * `D_num²·10⁴ > 18441·n_a·n_b·(n_a+n_b)` — DECIMAL(38,0)/HUGEINT
    * lanes, no square root, headroom to n ≈ 10⁸ per key. The integer
    * literal 18441 FLOORS 1.358² = 1.844164, i.e. the critical
    * threshold is ≤1 ulp below the exact value and the test is
    * correspondingly ≤1 ulp LIBERAL — shared verbatim by the DuckDB
    * oracle, so the two engines agree bit-exactly by construction. `d_ppm`
    * reports the gap itself (`D_num·10⁶ DIV (n_a·n_b)`). Keys missing
    * either group report NULLs.
    *
    * Scale: cumulative counts come from [[cumHist2ByKey]] cells (hash
    * aggregates + cell-grain windows) — no per-key sort window, the
    * [[mannWhitney]] profile.
    */
  def ksTest(
      df: DataFrame,
      keyCol: Column,
      inGroupBCol: Column,
      valueCol: Column
  ): DataFrame = {
    val base = df.select(keyCol.as("key"), inGroupBCol.cast("boolean").as("b"),
        valueCol.cast("long").as("v"))
      .filter(col("b").isNotNull && col("v").isNotNull)
    // ECDF gap off the keyed two-group histogram cells instead of a
    // `Window.partitionBy(key).orderBy(v)` RANGE-frame cum pass: the
    // inclusive per-cell cumulative counts (__cea/__ceb) ARE the
    // RANGE-frame values every row of the cell shared, so the per-key
    // max over cells equals the max over rows bit for bit (StatsSpec
    // pins it). A dominant key costs hash aggregates and cell-grain
    // windows, never a corpus-grain single-reducer sort (guide §2.5).
    cumHist2ByKey(base, col("key"), col("v"), col("b"))
      .groupBy(col("__k").as("key"))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        max(abs(expr(
          "CAST(__cea AS DECIMAL(38,0)) * __nb" +
            " - CAST(__ceb AS DECIMAL(38,0)) * __na")))
          .as("__dnum"))
      .withColumn("d_ppm", expr(
        "CASE WHEN n_a > 0 AND n_b > 0 THEN CAST((__dnum * 1000000)" +
          " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) END"))
      .withColumn("significant", expr(
        "CASE WHEN n_a > 0 AND n_b > 0 THEN __dnum * __dnum * 10000" +
          " > CAST(18441 AS DECIMAL(38,0)) * n_a * n_b * (n_a + n_b) END"))
      .select(col("key"), col("n_a"), col("n_b"), col("d_ppm"),
        col("significant"))
  }

  /** Permutation test for a mean difference, DETERMINISTIC end to end
    * — the assumption-free significance readout ([[abChiSquare]]
    * assumes the 2×2 asymptotics, [[mannWhitney]] the rank
    * z-approximation; the permutation test assumes nothing but
    * exchangeability). Instead of sampling random relabelings, each of
    * the `b` permutations IS a hash family member: permutation `p`
    * assigns `unit → md5(permSeedBase+p : unit) mod 2`, so the whole
    * test — every relabeling, every statistic, the p-value — replays
    * bit-exactly on any engine (the md5 portability contract).
    *
    * The statistic is the cross-multiplied mean-difference numerator
    * `T = |S₁·n₀ − S₀·n₁|` (unit sums, so per-unit correlation is
    * respected); permutations compare against the observed split via
    * the cleared inequality `T_p·(n₁·n₀) ≥ T_obs·(n₁ₚ·n₀ₚ)` in
    * DECIMAL(38,0) lanes — different relabelings have different arm
    * sizes, and clearing the denominators keeps the comparison exact.
    * `p_value_ppm = (1 + #{p : ≥}) · 10⁶ DIV (b+1)` (the add-one
    * convention — never exactly zero), `significant` is the cleared
    * `(1 + cnt)·20 ≤ b+1` (α = 0.05). A degenerate observed split
    * (either arm empty) reports NULLs.
    *
    * Scale: one shuffle to unit grain, then a map-side ×`b` expansion
    * (`explode(sequence)`) that aggregates IMMEDIATELY to ≤`b` cells
    * per task (the [[Profile.checkConstraints]] counter pattern ×b) —
    * cost is b·units rows THROUGH a partial aggregate, never
    * materialized; b is caller-bounded configuration.
    */
  def permutationTest(
      df: DataFrame,
      unitCol: Column,
      valueCol: Column,
      b: Int = 199,
      seed: Int = 7,
      permSeedBase: Int = 1000
  ): DataFrame = {
    require(b >= 1, "need at least one permutation")
    require(seed < permSeedBase || seed >= permSeedBase + b,
      "observed seed must not collide with the permutation seed family")
    import graft.functions.Hashing
    val units = df
      .select(unitCol.cast("string").as("unit"), valueCol.cast("long").as("v"))
      .filter(col("unit").isNotNull && col("v").isNotNull)
      .groupBy("unit").agg(sum(col("v")).as("uv"))
    def tStat(armCol: Column): Seq[Column] = Seq(
      sum(when(armCol === 1L, col("uv")).otherwise(0L)).as("s1"),
      sum(when(armCol === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when(armCol === 0L, col("uv")).otherwise(0L)).as("s0"),
      sum(when(armCol === 0L, 1L).otherwise(0L)).as("n0"))
    val obs = units
      .agg(tStat(pmod(Hashing.md5Hash32(seed, col("unit")), lit(2L))).head,
        tStat(pmod(Hashing.md5Hash32(seed, col("unit")), lit(2L))).tail: _*)
      .withColumn("t_obs", expr(
        "abs(CAST(s1 AS DECIMAL(38,0)) * n0 - CAST(s0 AS DECIMAL(38,0)) * n1)"))
      .select(col("t_obs"), col("n1").as("n1_obs"), col("n0").as("n0_obs"))
    val perms = units
      .withColumn("p", explode(expr(s"sequence(0, ${b - 1})")))
      .withColumn("arm",
        pmod(Hashing.md5Hash32(col("p") + lit(permSeedBase), col("unit")), lit(2L)))
      .groupBy("p")
      .agg(tStat(col("arm")).head, tStat(col("arm")).tail: _*)
      .withColumn("t_p", expr(
        "abs(CAST(s1 AS DECIMAL(38,0)) * n0 - CAST(s0 AS DECIMAL(38,0)) * n1)"))
    perms
      .crossJoin(broadcast(obs))
      .agg(count(lit(1)).as("n_perms"),
        sum(when(expr(
          "t_p * (CAST(n1_obs AS DECIMAL(38,0)) * n0_obs)" +
            " >= t_obs * (CAST(n1 AS DECIMAL(38,0)) * n0)"), 1L)
          .otherwise(0L)).as("n_ge"),
        max(col("n1_obs")).as("n_treat"), max(col("n0_obs")).as("n_control"))
      .withColumn("p_value_ppm", expr(
        "CASE WHEN n_treat > 0 AND n_control > 0 THEN" +
          " ((1 + n_ge) * 1000000) DIV (n_perms + 1) END"))
      .withColumn("significant", expr(
        "CASE WHEN n_treat > 0 AND n_control > 0 THEN" +
          " (1 + n_ge) * 20 <= n_perms + 1 END"))
      .select(col("n_treat"), col("n_control"), col("n_perms"),
        col("n_ge"), col("p_value_ppm"), col("significant"))
  }

  /** Poisson(1) CDF thresholds scaled to 2³² — the integer decision
    * boundaries of the deterministic bootstrap weight draw. `t(k)` is
    * `floor(P[Poisson(1) ≤ k] · 2³²)` precomputed to 60 digits, so the
    * weight `w = #{k : hash32 ≥ t(k)}` is a pure integer comparison
    * chain with NO floating point on either engine. Ten thresholds cap
    * the weight at 10 (`P[w ≥ 10] ≈ 1.0e-8` — one unit in 100M draws).
    */
  private[graft] val PoissonThresholds: Seq[Long] = Seq(
    1580030168L, 3160060337L, 3950075421L, 4213413783L, 4279248373L,
    4292415291L, 4294609777L, 4294923276L, 4294962463L, 4294966817L)

  /** Poisson bootstrap CI for the per-unit mean, DETERMINISTIC end to
    * end — the resampling method that actually works at 100 TB. A
    * classical bootstrap resamples n units WITH replacement, which
    * needs a global draw (undistributable); the Poisson bootstrap
    * replaces the multinomial resample with independent per-unit
    * Poisson(1) weights — map-side, no coordination, and statistically
    * equivalent for large n (Chamandy et al., "Estimating Uncertainty
    * for Massive Data Streams", Google 2012).
    *
    * Determinism: replicate `r` weights unit `u` by
    * `w = #{k : md5(bootSeedBase+r : u) ≥ t_k}` over the ten integer
    * [[PoissonThresholds]] — the whole resample is a seeded-md5 hash
    * family member, so every replicate, every weighted mean, and the
    * CI replay bit-exactly on any engine (no floats anywhere: the
    * Poisson inverse-CDF is baked into integer literals).
    *
    * Readout: replicate means in centi-units `(Σw·v)·100 DIV Σw`
    * (NULL for the astronomically-unlikely all-zero-weight replicate,
    * excluded), CI bounds are the `floor((R+1)·0.025)`-th and mirrored
    * order statistics of the non-null replicate means (b=199 → ranks 5
    * and 195, the standard 95% percentile bootstrap), plus the
    * observed full-sample mean.
    *
    * Scale: one shuffle to unit grain, then a map-side ×`b` expansion
    * aggregated IMMEDIATELY to ≤`b` cells per task (the
    * [[permutationTest]] expansion pattern); the order-statistic
    * window runs over exactly `b` rows.
    */
  def poissonBootstrapCI(
      df: DataFrame,
      unitCol: Column,
      valueCol: Column,
      b: Int = 199,
      bootSeedBase: Int = 2000
  ): DataFrame = {
    require(b >= 3, "need at least three replicates for a percentile CI")
    import graft.functions.Hashing
    val units = df
      .select(unitCol.cast("string").as("unit"), valueCol.cast("long").as("v"))
      .filter(col("unit").isNotNull && col("v").isNotNull)
      .groupBy("unit").agg(sum(col("v")).as("uv"))
    val obs = units
      .agg(sum(col("uv").cast("decimal(38,0)")).as("tot"),
        count(lit(1)).as("n_units"))
      .select(col("n_units"),
        expr("(tot * 100) DIV n_units").as("mean_centi"))
    val h = Hashing.md5Hash32(col("r") + lit(bootSeedBase), col("unit"))
    val w = PoissonThresholds
      .map(t => when(h >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val reps = units
      .withColumn("r", explode(expr(s"sequence(0, ${b - 1})")))
      .withColumn("w", w)
      .groupBy("r")
      .agg(sum((col("w") * col("uv")).cast("decimal(38,0)")).as("ws"),
        sum(col("w")).as("wn"))
      .withColumn("m", expr("CASE WHEN wn > 0 THEN (ws * 100) DIV wn END"))
      .filter(col("m").isNotNull)
      .withColumn("rn", row_number().over(Window.orderBy(col("m"), col("r"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
      .withColumn("lo_rank", greatest(lit(1L), expr("((cnt + 1) * 25) DIV 1000")))
      .agg(
        max(col("cnt")).as("n_reps"),
        min(when(col("rn") === col("lo_rank"), col("m"))).as("ci_lo_centi"),
        min(when(col("rn") === col("cnt") + 1L - col("lo_rank"), col("m")))
          .as("ci_hi_centi"))
    reps.crossJoin(broadcast(obs))
      .select(col("n_units"), col("n_reps"), col("mean_centi"),
        col("ci_lo_centi"), col("ci_hi_centi"))
  }

  /** Kaplan–Meier survival curve with right-censoring, integer-exact —
    * the estimator [[graft.ops.Behavior.retentionCohorts]] cannot
    * provide: cohort grids count conversions, KM handles the units
    * still alive at corpus end (censored) without biasing the curve
    * toward early churners.
    *
    * Units are `(key, unit)` lifespans from first to last observed day;
    * a unit DIES at duration `d1 − d0` iff its last day is at least
    * `censorDays` before the global corpus max day, otherwise it is
    * CENSORED there (leaves the risk set, no death). At each duration
    * with ≥1 death: `n_risk` = units with duration ≥ t (cumulative
    * count from above), and the survival probability steps down by the
    * exact factor `(n_risk − d) / n_risk`, carried in ppm with a
    * per-step floor — `s ← (s · (n_risk − d)) DIV n_risk` — so the
    * whole curve is a deterministic integer recurrence both engines
    * replay step for step (oracle: recursive CTE; here: an `aggregate`
    * HOF scan over the per-key step array).
    *
    * Scale: unit-grain agg → duration-cell agg (≤ #days cells per key)
    * → per-key sorted step array (bounded by the day span, NOT the
    * corpus) → one map-side scan. Three narrow shuffles, nothing
    * proportional to unit count past the first.
    */
  /** Shared survival front half: unit lifespans → (key, dur) duration
    * cells with death/censor marks → at-risk counts from above; the
    * death-step rows `(key, dur, nr, n_death)` both estimators
    * ([[kaplanMeier]], [[nelsonAalen]]) consume — ONE definition so
    * their risk sets can never drift.
    */
  private def survivalSteps(
      df: DataFrame,
      keyCol: Column,
      unitCol: Column,
      tsCol: Column,
      censorDays: Int
  ): DataFrame = {
    require(censorDays >= 0, "censor window must be nonnegative")
    val base = df
      .filter(keyCol.isNotNull && unitCol.isNotNull && tsCol.isNotNull)
      .select(keyCol.as("key"), unitCol.cast("string").as("unit"),
        (unix_timestamp(tsCol).cast("long")).as("sec"))
      .withColumn("day", expr("sec DIV 86400"))
    val spans = base.groupBy("key", "unit")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val maxDay = base.agg(max(col("day")).as("max_day"))
    val cells = spans.crossJoin(broadcast(maxDay))
      .select(col("key"), (col("d1") - col("d0")).as("dur"),
        when(col("d1") + censorDays <= col("max_day"), 1L).otherwise(0L)
          .as("death"))
      .groupBy("key", "dur")
      .agg(count(lit(1)).as("n_all"), sum(col("death")).as("n_death"))
    // keyed sort window, BOUNDED INPUT by construction: it runs over
    // the (key, dur) duration cells the aggregate above just built —
    // ≤ one row per observed day-span per key, calendar-bounded, never
    // unit- or event-scaled — so a dominant key sorts at most #days
    // rows on one reducer (the r20 window audit's benign class; the
    // cumHist swap would buy nothing here because the input is already
    // a histogram).
    val fromAbove = Window.partitionBy(col("key")).orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("nr", sum(col("n_all")).over(fromAbove))
      .filter(col("n_death") > 0)
  }

  def kaplanMeier(
      df: DataFrame,
      keyCol: Column,
      unitCol: Column,
      tsCol: Column,
      censorDays: Int = 7
  ): DataFrame = {
    val steps = survivalSteps(df, keyCol, unitCol, tsCol, censorDays)
      .groupBy("key")
      .agg(sort_array(collect_list(struct(
        col("dur").as("t"), col("nr"), col("n_death").as("d")))).as("steps"))
    // scan: running ppm survival with a floor at every death step
    steps
      .select(col("key"), explode(expr(
        """aggregate(steps,
          |  named_struct('s', CAST(1000000 AS BIGINT),
          |    'out', CAST(array() AS ARRAY<STRUCT<t: BIGINT, nr: BIGINT,
          |      d: BIGINT, s: BIGINT>>)),
          |  (acc, x) -> named_struct(
          |    's', (acc.s * (x.nr - x.d)) DIV x.nr,
          |    'out', array_append(acc.out, named_struct('t', x.t,
          |      'nr', x.nr, 'd', x.d,
          |      's', (acc.s * (x.nr - x.d)) DIV x.nr))),
          |  acc -> acc.out)""".stripMargin)).as("st"))
      .select(col("key"), col("st.t").as("t_day"), col("st.nr").as("n_risk"),
        col("st.d").as("n_deaths"), col("st.s").as("survival_ppm"))
      .orderBy("key", "t_day")
  }

  /** Nelson–Aalen cumulative hazard (Nelson 1972; Aalen 1978) —
    * [[kaplanMeier]]'s additive sibling on the IDENTICAL risk sets
    * ([[survivalSteps]]): `Ĥ(t) = Σ_{t_i ≤ t} d_i/n_i`, the estimator
    * of choice when hazard RATES are compared or fed downstream
    * (KM multiplies survival, NA adds hazard — near ties they differ
    * exactly where heavy per-step death fractions make −log S a bad
    * hazard proxy). Each step floors once (`(d·1e6) DIV nr`); the
    * cumulative lane is a plain running SUM of the floored steps —
    * order-independent, so it rides a window cumsum, no HOF scan.
    *
    * Output per death step: `t_day`, `n_risk`, `n_deaths`,
    * `hazard_step_ppm`, `cum_hazard_ppm`. Scale: identical to KM —
    * two keyed aggregates + one key-partitioned window over the
    * duration-bounded step rows.
    */
  def nelsonAalen(
      df: DataFrame,
      keyCol: Column,
      unitCol: Column,
      tsCol: Column,
      censorDays: Int = 7
  ): DataFrame = {
    // keyed sort window over [[survivalSteps]]' death-step cells —
    // duration-cell grain, calendar-bounded per key (same benign class
    // as the fromAbove window inside survivalSteps)
    val cum = Window.partitionBy(col("key")).orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    survivalSteps(df, keyCol, unitCol, tsCol, censorDays)
      .withColumn("hazard_step_ppm", expr("(n_death * 1000000) DIV nr"))
      .withColumn("cum_hazard_ppm", sum(col("hazard_step_ppm")).over(cum))
      .select(col("key"), col("dur").as("t_day"), col("nr").as("n_risk"),
        col("n_death").as("n_deaths"), col("hazard_step_ppm"),
        col("cum_hazard_ppm"))
      .orderBy("key", "t_day")
  }

  /** CUPED variance-reduced experiment readout (Deng et al., WSDM'13)
    * — the standard trick that makes A/B tests decisive on a fraction
    * of the traffic: regress the metric on a PRE-experiment covariate
    * and remove the explained variance from the treatment delta.
    *
    * Determinism: the md5 seed-`seed` arm split ([[abChiSquare]]'s
    * convention), and every readout is a fixed sequence of integer
    * operations — the pooled slope is floored ONCE to milli-units
    * (`theta_milli = θn·1000 DIV θd`) and then composed
    * (`Δ_cuped = Δ_raw − θ_milli·Δx_milli DIV 1000`), so both engines
    * replay the identical floors instead of racing a 1-ulp float. The
    * early floor keeps every lane ≤ n²·B² (n units, |unit sum| ≤ B)
    * — inside DECIMAL(38,0) for n·B up to ~10¹⁸ — where the exact
    * rational form would need n⁴·B³.
    *
    * Output (one row): unit counts, raw delta and covariate delta in
    * milli-units, the pooled slope in milli, the CUPED-adjusted delta,
    * and `rho2_ppm` (the fraction of metric variance the covariate
    * explains — the variance-reduction factor). `theta`/`cuped`/`rho2`
    * are NULL when the covariate is constant (θd = 0) or an arm is
    * empty; `rho2_ppm` additionally needs metric variance > 0.
    *
    * Scale: one shuffle to unit grain, one global aggregate. Nothing
    * else.
    */
  def cupedReadout(
      df: DataFrame,
      unitCol: Column,
      yCol: Column,
      xCol: Column,
      seed: Int = 7
  ): DataFrame = {
    import graft.functions.Hashing
    val units = df
      .select(unitCol.cast("string").as("unit"),
        coalesce(yCol.cast("long"), lit(0L)).as("y"),
        coalesce(xCol.cast("long"), lit(0L)).as("x"))
      .filter(col("unit").isNotNull)
      .groupBy("unit").agg(sum(col("y")).as("uy"), sum(col("x")).as("ux"))
      .withColumn("arm", pmod(Hashing.md5Hash32(seed, col("unit")), lit(2L)))
    val d38 = "decimal(38,0)"
    units
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 1L, col("uy")).otherwise(0L)).as("sy_t"),
        sum(when(col("arm") === 0L, col("uy")).otherwise(0L)).as("sy_c"),
        sum(when(col("arm") === 1L, col("ux")).otherwise(0L)).as("sx_t"),
        sum(when(col("arm") === 0L, col("ux")).otherwise(0L)).as("sx_c"),
        sum(col("uy").cast(d38)).as("sy"),
        sum(col("ux").cast(d38)).as("sx"),
        sum(col("ux").cast(d38) * col("uy")).as("sxy"),
        sum(col("ux").cast(d38) * col("ux")).as("sxx"),
        sum(col("uy").cast(d38) * col("uy")).as("syy"))
      .withColumn("n_c", expr("n - n_t"))
      .withColumn("theta_n", expr("n * sxy - sx * sy"))
      .withColumn("theta_d", expr("n * sxx - sx * sx"))
      .withColumn("v_y", expr("n * syy - sy * sy"))
      .withColumn("ok", expr("n_t > 0 AND n_c > 0"))
      .withColumn("delta_raw_milli", expr(
        "CASE WHEN ok THEN (CAST(sy_t AS DECIMAL(38,0)) * n_c - " +
          "CAST(sy_c AS DECIMAL(38,0)) * n_t) * 1000 DIV (n_t * n_c) END"))
      .withColumn("delta_x_milli", expr(
        "CASE WHEN ok THEN (CAST(sx_t AS DECIMAL(38,0)) * n_c - " +
          "CAST(sx_c AS DECIMAL(38,0)) * n_t) * 1000 DIV (n_t * n_c) END"))
      .withColumn("theta_milli", expr(
        "CASE WHEN ok AND theta_d > 0 THEN (theta_n * 1000) DIV theta_d END"))
      .withColumn("delta_cuped_milli", expr(
        "CASE WHEN theta_milli IS NOT NULL THEN delta_raw_milli" +
          " - (theta_milli * delta_x_milli) DIV 1000 END"))
      .withColumn("rho2_ppm", expr(
        "CASE WHEN theta_milli IS NOT NULL AND v_y > 0 THEN" +
          " theta_milli * ((theta_n * 1000) DIV v_y) END"))
      .select(col("n").as("n_units"), col("n_t").as("n_treat"),
        col("n_c").as("n_control"), col("delta_raw_milli"),
        col("delta_x_milli"), col("theta_milli"),
        col("delta_cuped_milli"), col("rho2_ppm"))
  }

  /** Exact integer square root as a Column: IEEE `sqrt` is correctly
    * rounded, so for `q` exactly representable in a double (q ≤ 2⁵²)
    * `floor(sqrt(q))` is within ±1 of `isqrt(q)` on EVERY engine — two
    * integer CASE corrections make it exact, turning sqrt from a
    * 1-ulp portability hazard into a deterministic integer op.
    */
  private def isqrt(q: Column): Column = {
    val c0 = floor(sqrt(q.cast("double"))).cast("long")
    when(q < 0L, lit(null))
      .when((c0 + 1) * (c0 + 1) <= q, c0 + 1)
      .when(c0 * c0 > q, c0 - 1)
      .otherwise(c0)
  }

  /** `(z_{α/2} + z_β)²` in micro-units for α = 0.05, power = 0.80 —
    * `(1.9599640 + 0.8416212)² = 7.848880` — the fixed convention
    * constant of the two-sample power formula (the [[abChiSquare]]
    * 3841-milli pattern: conventions are integer literals, never
    * runtime floats).
    */
  private val PowerConstMicro = 7848880L

  /** Experiment power analysis from observed data — "is this test
    * even winnable, and how long must it run": the minimum detectable
    * effect (MDE) of the CURRENT arm split at α = 0.05 / 80% power,
    * and the per-arm sample size required to detect the OBSERVED
    * delta. The formulas are the standard two-sample normal
    * approximation `MDE² = C·σ²·(1/n_t + 1/n_c)` and
    * `n_req = 2·C·σ²/Δ²` with C = [[PowerConstMicro]].
    *
    * Exactness: unit variance is carried as the cleared numerator
    * `VN = n·Σv² − (Σv)²` in DECIMAL(38,0); the MDE square is floored
    * once to an integer and rooted with [[isqrt]] (exact given the
    * documented bound: the floored MDE² must fit a double exactly,
    * i.e. ≤ 2⁵² — metric units up to ~6.7e7 centi). `n_req` uses
    * ceiling division and NULLs out on a zero observed delta;
    * everything NULLs on n < 2 or an empty arm.
    *
    * Scale: one shuffle to unit grain, one global aggregate —
    * [[cupedReadout]]'s profile.
    */
  def powerAnalysis(
      df: DataFrame,
      unitCol: Column,
      valueCol: Column,
      seed: Int = 7
  ): DataFrame = {
    import graft.functions.Hashing
    val units = df
      .select(unitCol.cast("string").as("unit"), valueCol.cast("long").as("v"))
      .filter(col("unit").isNotNull && col("v").isNotNull)
      .groupBy("unit").agg(sum(col("v")).as("uv"))
      .withColumn("arm", pmod(Hashing.md5Hash32(seed, col("unit")), lit(2L)))
    val d38 = "decimal(38,0)"
    units
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 1L, col("uv")).otherwise(0L)).as("s_t"),
        sum(when(col("arm") === 0L, col("uv")).otherwise(0L)).as("s_c"),
        sum(col("uv").cast(d38)).as("sv"),
        sum(col("uv").cast(d38) * col("uv")).as("svv"))
      .withColumn("n_c", expr("n - n_t"))
      .withColumn("vn", expr("n * svv - sv * sv"))
      .withColumn("ok", expr("n >= 2 AND n_t > 0 AND n_c > 0"))
      // per-unit variance, floored to whole centi^2 units
      .withColumn("var_centi2", expr(
        "CASE WHEN n >= 2 THEN vn DIV (CAST(n AS DECIMAL(38,0)) * (n - 1)) END"))
      .withColumn("mde2", expr(
        s"CASE WHEN ok THEN ($PowerConstMicro * vn * (n_t + n_c))" +
          " DIV (CAST(1000000 AS DECIMAL(38,0)) * n * (n - 1) * n_t * n_c) END"))
      .withColumn("mde_centi", isqrt(col("mde2")))
      .withColumn("delta_centi", expr(
        "CASE WHEN ok THEN (CAST(s_t AS DECIMAL(38,0)) * n_c" +
          " - CAST(s_c AS DECIMAL(38,0)) * n_t) DIV (CAST(n_t AS DECIMAL(38,0)) * n_c) END"))
      .withColumn("n_per_arm_req", expr(
        s"CASE WHEN ok AND delta_centi != 0 THEN" +
          s" (2 * $PowerConstMicro * vn" +
          "   + CAST(1000000 AS DECIMAL(38,0)) * n * (n - 1) * delta_centi * delta_centi - 1)" +
          "  DIV (CAST(1000000 AS DECIMAL(38,0)) * n * (n - 1) * delta_centi * delta_centi) END"))
      .select(col("n").as("n_units"), col("n_t").as("n_treat"),
        col("n_c").as("n_control"),
        expr("CAST(var_centi2 AS BIGINT)").as("var_centi2"),
        col("mde_centi"), col("delta_centi"),
        expr("CAST(n_per_arm_req AS BIGINT)").as("n_per_arm_req"))
  }

  /** Calibration report + expected calibration error (ECE), exact —
    * "when the model says 70%, is it right 70% of the time": scores in
    * ppm are cut into `bins` equal-width confidence bins; each
    * occupied bin reports its size, mean confidence, and empirical
    * accuracy, and a trailing `bin = -1` row carries the ECE.
    *
    * The per-bin `n_b` cancels out of the textbook ECE
    * `Σ_b (n_b/N)·|conf̄_b − acc_b|`, leaving the fully-integer
    * `ece_ppm = (Σ_b |Σconf_b − 10⁶·Σy_b|) DIV N` — one exact
    * floor, no per-bin division anywhere in the headline number.
    *
    * Scale: one shuffle to ≤ `bins` cells; the report is cell-sized.
    * Confidences are clamped to [0, 10⁶]; ppm 10⁶ lands in the last
    * bin.
    */
  def calibrationReport(
      df: DataFrame,
      confPpmCol: Column,
      labelCol: Column,
      bins: Int = 10
  ): DataFrame = {
    require(bins >= 2, "need at least two confidence bins")
    val base = df
      .select(confPpmCol.cast("long").as("conf0"),
        labelCol.cast("boolean").as("yb"))
      .filter(col("conf0").isNotNull && col("yb").isNotNull)
      .select(
        least(greatest(col("conf0"), lit(0L)), lit(1000000L)).as("conf"),
        when(col("yb"), 1L).otherwise(0L).as("y"))
      .withColumn("bin",
        least(expr(s"(conf * $bins) DIV 1000000"), lit(bins - 1L)))
    val cells = base.groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("conf").cast("decimal(38,0)")).as("sc"),
        sum(col("y")).as("sy"))
    val binRows = cells.select(col("bin"), col("n"),
      expr("sc DIV n").as("mean_conf_ppm"),
      expr("(CAST(sy AS DECIMAL(38,0)) * 1000000) DIV n").as("acc_ppm"),
      lit(null).cast("long").as("ece_ppm"))
    val total = cells
      .agg(sum(col("n")).as("nn"),
        sum(expr("abs(sc - CAST(sy AS DECIMAL(38,0)) * 1000000)")).as("gap"))
      .select(lit(-1L).as("bin"), col("nn").as("n"),
        lit(null).cast("long").as("mean_conf_ppm"),
        lit(null).cast("long").as("acc_ppm"),
        expr("CASE WHEN nn > 0 THEN gap DIV nn END").as("ece_ppm"))
    binRows.unionByName(total).orderBy("bin")
  }

  /** Quantile normalization across sources — the batch-effect
    * correction for mixing corpora scored on different scales: each
    * row's WITHIN-key percentile is mapped onto the POOLED
    * distribution's value at the same permille, so "top decile of
    * source A" and "top decile of source B" land on the same
    * normalized score while within-source order is preserved exactly.
    *
    * Integer end to end: within-key percentile is the
    * [[graft.ext.TextOps.percentileRankPpm]] convention
    * `(rank−1)·10⁶ DIV (cnt−1)`; the pooled side is a 1001-point
    * permille grid of rank-selected order statistics (`rn = 1 +
    * (N−1)·g DIV 1000` — value-deterministic under ties since rows
    * are sorted by value), and each row equi-joins the grid at
    * `g = pct_ppm DIV 1000` — a broadcast lookup, no as-of needed.
    *
    * Scale: ONE keyed histogram ([[cumHistByKey]]) feeds both legs —
    * the within-key percentile reads its (key, value) cells and the
    * pooled grid folds them into the global histogram
    * ([[cumHistOfHist]] + [[gridOfCells]]), so there is no per-key
    * sort window anywhere (a dominant stratum costs a hash-aggregate,
    * never one reducer) and no second corpus scan for the pooled leg;
    * the grid itself is 1001 rows broadcast and the normalization join
    * is map-side.
    *
    * Output: the input columns plus `pct_ppm` (within-key) and
    * `norm_score` (pooled value at that permille). NULL keys/scores
    * are dropped.
    */
  /** The pooled 1001-point permille grid — REFERENCE formulation
    * (`row_number` over one global value sort; single-reducer, so
    * VERIFIER SCALE ONLY): `norm_score(g)` = the pooled value at rank
    * `1 + (N−1)·g DIV 1000` (value-deterministic under ties). Kept as
    * the spec twin the scale-safe [[pooledGridHist]] and the streaming
    * twin (`streaming.StatefulOps.quantileGridStream`) are both
    * parity-pinned against; [[quantileNormalize]] and the q319 grid
    * query run [[pooledGridHist]]. NULL scores are dropped.
    * Output: (`__g`, `norm_score`), 1001 rows.
    */
  def pooledGrid(df: DataFrame, scoreCol: Column): DataFrame = {
    val base = df.filter(scoreCol.isNotNull)
    val pooled = base.select(scoreCol.cast("long").as("__v"))
      .withColumn("__rn", row_number().over(Window.orderBy(col("__v"))))
    base.agg(count(lit(1)).as("__n"))
      .select(explode(sequence(lit(0L), lit(1000L))).as("__g"), col("__n"))
      .withColumn("__rn", expr("1 + ((__n - 1) * __g) DIV 1000"))
      .join(pooled, Seq("__rn"))
      .select(col("__g"), col("__v").as("norm_score"))
  }

  /** [[pooledGrid]]'s SCALE-SAFE twin — bit-identical output (pinned by
    * `StatsGridSpec`), but the single-reducer `row_number` sort over
    * every score is replaced by the histogram/rank decomposition (the
    * machinery `ext.Sampling.selectTokenBudget` proved): order
    * statistics are computed from exact per-VALUE counts, so nothing
    * corpus-sized is ever sorted on one partition.
    *
    *  1. Histogram: one hash-aggregate to `(value, count)` — grain =
    *     DISTINCT scores (for ppm-scaled scores ≤ 10⁶+1 rows however
    *     large the corpus).
    *  2. Exact cumulative ranks WITHOUT a global sort window: the
    *     histogram is range-repartitioned by value and the running sum
    *     runs PARTITIONED by `spark_partition_id()` (range partitions
    *     are value-contiguous, so partition-local prefix + a broadcast
    *     per-partition offset = the exact global prefix — the classic
    *     distributed prefix-sum). The offsets are a ≤-numPartitions-row
    *     collect (partition-bounded, never row-scaled); the histogram
    *     is LAZILY localCheckpointed and pid consistency relies on the
    *     offsets collect being the FIRST action that fully
    *     materializes the checkpointed partitions — the main query
    *     then reuses the frozen blocks (the cumHistByKey step-2
    *     contract).
    *  3. Each value row covers ranks `(cs, ce]`; grid point `g` asks
    *     for rank `rn_g = 1 + (N−1)·g DIV 1000`, monotone in `g`, so a
    *     row's covered grid points are the CONTIGUOUS integer range
    *     `⌈1000·cs/(N−1)⌉ ≤ g ≤ (1000·ce − 1) DIV (N−1)` (N=1: the
    *     single rank covers all 1001) — derived arithmetically per row
    *     and exploded map-side. Exactly 1001 rows come out.
    *
    * Ties agree with [[pooledGrid]] by construction: `row_number` over
    * the value sort separates tied rows arbitrarily but every rank in
    * `(cs, ce]` carries the same VALUE, which is all the grid keeps.
    */
  def pooledGridHist(df: DataFrame, scoreCol: Column): DataFrame = {
    val (cells, n) = cumHist(df, scoreCol)
    gridOfCells(df.sparkSession, cells, n)
  }

  /** The 1001-point permille grid derived from [[cumHist]]-shaped cells
    * — split out so [[quantileNormalize]] can feed it the GLOBAL
    * histogram folded from [[cumHistByKey]]'s keyed cells (one corpus
    * scan serves both the within-key and the pooled leg) while
    * [[pooledGridHist]] keeps its one-argument contract.
    */
  private def gridOfCells(
      spark: org.apache.spark.sql.SparkSession,
      cells: DataFrame,
      n: Long): DataFrame = {
    if (n == 0L)
      return spark.range(0)
        .select(col("id").as("__g"), col("id").as("norm_score"))
    val gLo =
      if (n == 1L) lit(0L)
      else greatest(expr(s"(1000 * __cs + ${n - 2}) DIV ${n - 1}"), lit(0L))
    val gHi =
      if (n == 1L) lit(1000L)
      else least(expr(s"(1000 * __ce - 1) DIV ${n - 1}"), lit(1000L))
    cells
      .withColumn("__glo", gLo)
      .withColumn("__ghi", gHi)
      .filter(col("__glo") <= col("__ghi"))
      .select(explode(sequence(col("__glo"), col("__ghi"))).as("__g"),
        col("__v").as("norm_score"))
  }

  /** Exact per-DISTINCT-VALUE cumulative counts — the shared engine
    * under [[pooledGridHist]], [[globalRankHist]] and [[ntileHist]]:
    * one hash-aggregate to `(value, count)`, then the classic
    * distributed prefix-sum (range-repartition by value, LAZY
    * localCheckpoint whose partitioning is frozen by the offsets
    * collect — the FIRST action to fully materialize the checkpointed
    * partitions, which every later consumer then reuses — a
    * ≤-numPartitions-row offsets collect, and a running sum PARTITIONED
    * by `spark_partition_id()` — range partitions are value-contiguous,
    * so local prefix + broadcast offset = the exact global prefix).
    * Nothing corpus-sized ever sorts on one partition; the only
    * collect is partition-count-bounded.
    *
    * Returns the cells `(__v, __c, __cs, __ce)` — count, exclusive
    * cumulative start, inclusive cumulative end (so value `__v` holds
    * exactly the global ranks `(__cs, __ce]` of the ascending value
    * order) — and the total non-NULL row count N.
    */
  private[graft] def cumHist(
      df: DataFrame, valueCol: Column): (DataFrame, Long) = {
    requireIntegral(df, valueCol, "cumHist")
    cumHistOfHist(df.filter(valueCol.isNotNull)
      .select(valueCol.cast("long").as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__c")))
  }

  /** Advertised-equivalence guard for the histogram-rank family: the
    * engine aggregates on the value's LONG image, so a fractional value
    * column would silently merge distinct values under truncation (and
    * a non-null value whose long-cast is null would be counted in N yet
    * dropped by the rank join). All the ppm/milli lanes are integral by
    * convention; fail loudly instead of casting.
    */
  private def requireIntegral(
      df: DataFrame, valueCol: Column, who: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.select(valueCol.as("__t")).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$who requires an integral value column (the ppm/milli-lane " +
        s"convention) — got ${dt.simpleString}; scale fractional scores " +
        "to an integer lane first")
  }

  /** The distributed prefix-sum over an already-built `(__v, __c)`
    * histogram — [[cumHist]]'s core, split out so callers that ALREADY
    * hold a histogram (e.g. [[quantileNormalize]] folding the global
    * histogram out of [[cumHistByKey]]'s keyed cells) skip the second
    * corpus scan.
    */
  private[graft] def cumHistOfHist(hist: DataFrame): (DataFrame, Long) = {
    val spark = hist.sparkSession
    import spark.implicits._
    val parts = hist.repartitionByRange(col("__v"))
      .sortWithinPartitions("__v")
      .withColumn("__pid", spark_partition_id().cast("long"))
      .localCheckpoint(false)
    val perPart = parts.groupBy("__pid").agg(sum(col("__c")).as("__s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = perPart.iterator.map(_._2).sum
    var acc = 0L
    val offs = perPart.toSeq.map { case (pid, s) =>
      val o = acc; acc += s; (pid, o)
    }
    val wcum = Window.partitionBy(col("__pid")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cells = parts
      .withColumn("__ce", sum(col("__c")).over(wcum))
      .join(broadcast(offs.toDF("__pid", "__off")), Seq("__pid"))
      .withColumn("__ce", col("__ce") + col("__off"))
      .withColumn("__cs", col("__ce") - col("__c"))
      .select(col("__v"), col("__c"), col("__cs"), col("__ce"))
    (cells, n)
  }

  /** KEYED twin of [[cumHist]] — exact per-DISTINCT-(key, value)
    * cumulative counts WITHIN each key, with no driver collect and no
    * per-key sort wall: this is the engine that retires the last
    * sort-based rank windows (`Window.partitionBy(key).orderBy(score)`
    * in [[graft.ext.TextOps.percentileRankPpm]], [[groupEcdf]] and
    * [[quantileNormalize]]'s within-key leg), where a dominant stratum
    * — one language at 60% of a web corpus is the NORM — routes its
    * whole slice through one reducer.
    *
    *  1. Histogram to `(key, value, count)` — one hash aggregate;
    *     grain = distinct (key, value) pairs (for ppm lanes ≤ 10⁶+1
    *     rows PER KEY however large the corpus).
    *  2. Range-repartition by `(key, value)` (a dominant key spreads
    *     over many contiguous partitions) and freeze the layout with a
    *     lazy localCheckpoint so every consumer sees one
    *     `spark_partition_id()` assignment.
    *  3. The offsets walk, fully distributed: per-(partition, key)
    *     subtotals (one aggregate over the histogram), then a running
    *     sum per KEY across partition ids — that window holds at most
    *     `numPartitions` rows per key (partition-bounded, never
    *     value-scaled), the keyed analogue of [[cumHist]]'s
    *     ≤-numPartitions-row driver collect. The same window also
    *     emits the per-key total `__n` (whole-partition frame), so no
    *     separate per-key aggregate or extra join is needed.
    *  4. Partition-local running sums per `(partition, key)` ordered by
    *     value + the broadcast-free offset join = the exact per-key
    *     global prefix (range partitions are (key, value)-contiguous).
    *
    * Values keep their NATIVE type (no long cast — grouping and the
    * callers' join-back only need equality, so the integral-lane
    * precondition of [[cumHist]] does not apply). NULL values form
    * their own cell and sort FIRST (Spark's asc default) in both the
    * range partitioning and the running sum, matching
    * `orderBy(asc_nulls_first)` window semantics; NULL keys form their
    * own key group, matching `Window.partitionBy`. Callers that want
    * NULLs out filter first.
    *
    * Returns one row per distinct (key, value): `(__k, __v, __c, __cs,
    * __ce, __n)` — count, exclusive cumulative start, inclusive
    * cumulative end within the key (value `__v` holds exactly the
    * within-key ranks `(__cs, __ce]` of the ascending value order) and
    * the key's total row count.
    */
  private[graft] def cumHistByKey(
      df: DataFrame, keyCol: Column, valueCol: Column): DataFrame = {
    val hist = df.select(keyCol.as("__k"), valueCol.as("__v"))
      .groupBy("__k", "__v").agg(count(lit(1)).as("__c"))
    // no sortWithinPartitions: the range partitioner fixes __pid on its
    // own, and both downstream windows re-sort after their exchanges —
    // a pre-sort here would be a pure extra pass over the histogram
    val parts = hist.repartitionByRange(col("__k"), col("__v"))
      .withColumn("__pid", spark_partition_id().cast("long"))
      .localCheckpoint(false)
    // the offsets walk: per-(pid, key) subtotals, then per key a running
    // sum across pids (≤ numPartitions rows per key) — `__off` excludes
    // the own pid's subtotal; the unbounded frame on the same window
    // spec rides along as the per-key total
    val wOff = Window.partitionBy(col("__k")).orderBy(col("__pid"))
    val offs = parts.groupBy("__pid", "__k").agg(sum(col("__c")).as("__s"))
      .withColumn("__off", coalesce(sum(col("__s")).over(
        wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__s")).over(
        wOff.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__pid").as("__opid"), col("__k").as("__ok"),
        col("__off"), col("__n"))
    val wcum = Window.partitionBy(col("__pid"), col("__k"))
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts
      .withColumn("__ce", sum(col("__c")).over(wcum))
      .join(offs, col("__pid") === col("__opid") && col("__k") <=> col("__ok"))
      .withColumn("__ce", col("__ce") + col("__off"))
      .withColumn("__cs", col("__ce") - col("__c"))
      .select(col("__k"), col("__v"), col("__c"), col("__cs"), col("__ce"),
        col("__n"))
  }

  /** TWO-GROUP twin of [[cumHistByKey]] — the same keyed histogram +
    * distributed prefix sum carrying a (group-a, group-b) count PAIR
    * per (key, value) cell, for the rank/ECDF statistics that compare
    * two samples within each key ([[mannWhitney]], [[ksTest]]): both
    * groups' cells, cumulative counts and totals ride ONE range
    * partitioning and ONE pair of cell-grain windows, so neither group
    * ever sorts at corpus grain (the dominant-stratum wall the
    * `Window.partitionBy(key).orderBy(v)` formulation routed through
    * one reducer). Same NULL semantics, same (pid, key) offset walk.
    *
    * Returns one row per distinct (key, value): `(__k, __v, __ca,
    * __cb, __cea, __ceb, __na, __nb)` — per-group cell counts,
    * per-group INCLUSIVE cumulative counts within the key (ties
    * included: the RANGE-frame convention) and per-group key totals.
    */
  private[graft] def cumHist2ByKey(
      df: DataFrame, keyCol: Column, valueCol: Column,
      inGroupBCol: Column): DataFrame = {
    val hist = df
      .select(keyCol.as("__k"), valueCol.as("__v"),
        inGroupBCol.cast("boolean").as("__b"))
      .groupBy("__k", "__v")
      .agg(sum(when(col("__b"), 0L).otherwise(1L)).as("__ca"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("__cb"))
    val parts = hist.repartitionByRange(col("__k"), col("__v"))
      .withColumn("__pid", spark_partition_id().cast("long"))
      .localCheckpoint(false)
    val wOff = Window.partitionBy(col("__k")).orderBy(col("__pid"))
    val offs = parts.groupBy("__pid", "__k")
      .agg(sum(col("__ca")).as("__sa"), sum(col("__cb")).as("__sb"))
      .withColumn("__offa", coalesce(sum(col("__sa")).over(
        wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__offb", coalesce(sum(col("__sb")).over(
        wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__na", sum(col("__sa")).over(
        wOff.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__nb", sum(col("__sb")).over(
        wOff.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__pid").as("__opid"), col("__k").as("__ok"),
        col("__offa"), col("__offb"), col("__na"), col("__nb"))
    val wcum = Window.partitionBy(col("__pid"), col("__k"))
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts
      .withColumn("__cea", sum(col("__ca")).over(wcum))
      .withColumn("__ceb", sum(col("__cb")).over(wcum))
      .join(offs, col("__pid") === col("__opid") && col("__k") <=> col("__ok"))
      .withColumn("__cea", col("__cea") + col("__offa"))
      .withColumn("__ceb", col("__ceb") + col("__offb"))
      .select(col("__k"), col("__v"), col("__ca"), col("__cb"),
        col("__cea"), col("__ceb"), col("__na"), col("__nb"))
  }

  /** Within-key integer percentile rank in ppm off [[cumHistByKey]] —
    * the scale-safe spelling of `(rank(value)−1)·10⁶ DIV (n−1)` with
    * RANK ties (every row of a (key, value) cell shares `__cs + 1`) and
    * single-member keys pinned to 0, joined back to the input on the
    * (key, value) pair (null-safe on both sides, so NULL scores keep
    * their rank-1 cell and NULL keys their own stratum). Appends `out`;
    * every input column rides through.
    *
    * Scale shape vs the window formulation it replaces: the input is
    * scanned twice (histogram build + join-back — both column-pruned
    * scans) instead of once, but nothing is ever sorted at corpus
    * grain: the heaviest stratum costs one hash-aggregate and an
    * equi-join spread over its (key, value) cells.
    */
  private[graft] def pctRankPpmByKey(
      df: DataFrame, keyCol: Column, scoreCol: Column,
      out: String = "pct_ppm"): DataFrame = {
    val cells = cumHistByKey(df, keyCol, scoreCol)
      .withColumn(out,
        when(col("__n") > 1,
          expr("CAST((__cs * 1000000) DIV (__n - 1) AS BIGINT)"))
          .otherwise(lit(0L)))
      .select(col("__k").as("__hk"), col("__v").as("__hv"), col(out))
    df.join(cells, keyCol <=> col("__hk") && scoreCol <=> col("__hv"))
      .drop("__hk", "__hv")
  }

  /** Exact per-key order statistics off [[cumHistByKey]] — "p50/p90/p99
    * FOR EACH source/language" in one pass, the keyed counterpart of
    * [[pooledGridHist]]'s rank selection: for each requested permille
    * `p`, the key's value at rank `1 + (n−1)·p DIV 1000` of its
    * ascending value order (value-deterministic under ties — every rank
    * a cell covers carries the cell's value). NULL keys/values are
    * dropped. Output: one row per (key, permille): `(key, permille,
    * value, n)`.
    *
    * Scale shape: the keyed histogram + distributed prefix sum, then a
    * |permilles|-way explode over the CELLS (hist grain) with an
    * arithmetic rank test — no percentile_approx sketch error, no
    * per-key sort window, nothing corpus-sized on one partition.
    */
  def groupQuantilesHist(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      permilles: Seq[Int]
  ): DataFrame = {
    require(permilles.nonEmpty, "need at least one permille")
    require(permilles.forall(p => p >= 0 && p <= 1000),
      s"permilles must be in [0,1000]: $permilles")
    require(permilles.distinct.size == permilles.size,
      s"duplicate permilles: $permilles")
    val base = df.filter(keyCol.isNotNull && valueCol.isNotNull)
    cumHistByKey(base, keyCol, valueCol)
      .withColumn("permille",
        explode(typedlit(permilles.sorted.map(_.toLong))))
      .withColumn("__rn", expr("1 + ((__n - 1) * permille) DIV 1000"))
      .filter(col("__cs") < col("__rn") && col("__rn") <= col("__ce"))
      .select(col("__k").as("key"), col("permille"),
        col("__v").as("value"), col("__n").as("n"))
  }

  /** `ntile(k)` WITHIN each key over `(value ASC, tie ASC)` — the keyed
    * twin of [[ntileHist]] ("quality quartiles per language"): per-key
    * ranks come from [[cumHistByKey]]'s cells plus a `row_number`
    * partitioned by (key, value) (bounded by the heaviest tie cell,
    * the same honest residual as [[globalRankHist]]), and the tile is
    * the standard SQL assignment computed arithmetically from the rank
    * with the per-key `n` riding the cells — so it equals
    * `ntile(k) OVER (PARTITION BY key ORDER BY value, tie)` bit for bit
    * (`StatsSpec`) with no per-key sort window anywhere. NULL
    * keys/values are dropped; the tie column must be unique per row
    * within its key for a deterministic total order. Appends `out`.
    */
  def ntileHistByKey(
      df: DataFrame,
      k: Int,
      keyCol: Column,
      valueCol: Column,
      tieCol: Column,
      out: String
  ): DataFrame = {
    require(k >= 1, s"ntile k must be >= 1: $k")
    val base = df.filter(keyCol.isNotNull && valueCol.isNotNull)
    val cells = cumHistByKey(base, keyCol, valueCol)
      .select(col("__k").as("__hk"), col("__v").as("__hv"),
        col("__cs"), col("__n"))
    base
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCol, valueCol).orderBy(tieCol)).cast("long"))
      .join(cells, keyCol <=> col("__hk") && valueCol <=> col("__hv"))
      .withColumn("__rk", col("__cs") + col("__rn"))
      .withColumn(out, expr(
        s"""CASE WHEN __n DIV $k = 0 THEN __rk
           | WHEN __rk <= (__n % $k) * (__n DIV $k + 1)
           |   THEN (__rk - 1) DIV (__n DIV $k + 1) + 1
           | ELSE __n % $k + 1 +
           |   (__rk - (__n % $k) * (__n DIV $k + 1) - 1) DIV (__n DIV $k)
           |END""".stripMargin).cast("long"))
      .drop("__hk", "__hv", "__cs", "__n", "__rn", "__rk")
  }

  /** Exact 1-based global rank over `(value ASC, tie ASC)` WITHOUT a
    * corpus-wide single-partition sort: per-value start ranks come
    * from [[cumHist]]; the within-value order is a `row_number`
    * PARTITIONED by value (bounded by the heaviest tie group — the
    * honest residual: a corpus where one value holds most rows is the
    * skew regime, not the rank regime). Rows with NULL `value` are
    * dropped. Adds `out` (BIGINT); the tie column must be unique per
    * row for a deterministic total order.
    */
  def globalRankHist(
      df: DataFrame,
      valueCol: Column,
      tieCol: Column,
      out: String = "__rk"
  ): DataFrame = rankWithN(df, valueCol, tieCol, out)._1

  private def rankWithN(
      df: DataFrame,
      valueCol: Column,
      tieCol: Column,
      out: String
  ): (DataFrame, Long) = {
    val base = df.filter(valueCol.isNotNull)
    val (cells, n) = cumHist(base, valueCol)
    val ranked = base
      .withColumn("__v", valueCol.cast("long"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__v")).orderBy(tieCol)).cast("long"))
      .join(cells.select(col("__v"), col("__cs")), Seq("__v"))
      .withColumn(out, col("__cs") + col("__rn"))
      .drop("__v", "__rn", "__cs")
    (ranked, n)
  }

  /** `ntile(k)` over the total order `(value ASC, tie ASC)` computed
    * from [[globalRankHist]]'s exact ranks instead of a global sort
    * window — the scale path past ~10⁸ units for quantile segmentation
    * ([[graft.ops.Behavior.rfmSegmentsHist]], [[upliftDecilesHist]]).
    * The tile is the standard SQL assignment, a pure function of the
    * rank: with `b = N DIV k`, `r = N MOD k` the first `r` tiles hold
    * `b+1` rows — `tile = (rk−1) DIV (b+1) + 1` up to the cut
    * `r·(b+1)`, else `r + 1 + (rk−cut−1) DIV b` — so it equals
    * `ntile(k)` bit for bit (pinned in `StatsSpec`). For DESC value
    * order pass the negated column.
    */
  def ntileHist(
      df: DataFrame,
      k: Int,
      valueCol: Column,
      tieCol: Column,
      out: String
  ): DataFrame = {
    require(k >= 1, s"ntile k must be >= 1: $k")
    val (ranked, n) = rankWithN(df, valueCol, tieCol, "__nt_rk")
    val b = n / k
    val rem = n % k
    val cut = rem * (b + 1)
    val tile =
      if (n == 0L) lit(null).cast("long")
      else if (b == 0L) col("__nt_rk") // n < k: one row per tile
      else expr(
        s"CASE WHEN __nt_rk <= $cut THEN (__nt_rk - 1) DIV ${b + 1} + 1" +
          s" ELSE $rem + 1 + (__nt_rk - $cut - 1) DIV $b END")
    ranked.withColumn(out, tile.cast("long")).drop("__nt_rk")
  }

  def quantileNormalize(
      df: DataFrame,
      keyCol: Column,
      scoreCol: Column
  ): DataFrame = {
    requireIntegral(df, scoreCol, "quantileNormalize")
    val base = df.filter(keyCol.isNotNull && scoreCol.isNotNull)
    // ONE keyed histogram feeds both legs: the within-key percentile
    // (pct via the (key, value) cells) and the pooled 1001-point grid
    // (the global histogram is the keyed cells folded over keys —
    // hist-grain, so the second corpus scan the old window formulation
    // paid for the pooled leg is gone)
    val kcells = cumHistByKey(base, keyCol, scoreCol)
      .localCheckpoint(false)
    val pct = base.join(
        kcells.withColumn("pct_ppm",
            when(col("__n") > 1,
              expr("CAST((__cs * 1000000) DIV (__n - 1) AS BIGINT)"))
              .otherwise(lit(0L)))
          .select(col("__k").as("__hk"), col("__v").as("__hv"),
            col("pct_ppm")),
        keyCol <=> col("__hk") && scoreCol <=> col("__hv"))
      .drop("__hk", "__hv")
    val (gcells, n) = cumHistOfHist(
      kcells.groupBy(col("__v").cast("long").as("__v"))
        .agg(sum(col("__c")).as("__c")))
    pct
      .withColumn("__g", expr("pct_ppm DIV 1000"))
      .join(broadcast(gridOfCells(df.sparkSession, gcells, n)), Seq("__g"))
      .drop("__g")
  }

  /** Post-stratified experiment readout with the sample-ratio-mismatch
    * guardrail — the two checks an experiment platform runs before
    * trusting any delta:
    *
    *  1. SRM: a randomized 50/50 split whose arm sizes fail the
    *     goodness-of-fit test (`(n_t−n_c)²·1000 DIV n ≥ 3841` — the
    *     χ²₁ test at α=0.05, [[abChiSquare]]'s cleared-literal
    *     convention) almost always means broken assignment or logging
    *     — every downstream number is suspect.
    *  2. Post-stratification: the raw delta is re-estimated WITHIN
    *     each stratum and recombined with stratum-size weights —
    *     removing the covariate imbalance a finite random split
    *     leaves behind (the categorical-covariate counterpart of
    *     [[cupedReadout]]). Per stratum `Δs_milli` is floored once
    *     ([[cupedReadout]]'s early-floor idiom), then
    *     `Δ_post = Σ n_s·Δs_milli DIV N_inc`. Strata with an empty
    *     arm cannot estimate a delta and are EXCLUDED (counted in
    *     `n_strata_excluded`; their units still count in SRM and the
    *     raw delta).
    *
    * A unit's stratum is its MINIMUM observed stratum value —
    * deterministic under multi-valued units.
    *
    * Scale: unit-grain shuffle → stratum cells → stratum-bounded
    * recombination. Nothing corpus-sized past the first aggregate.
    */
  def stratifiedReadout(
      df: DataFrame,
      unitCol: Column,
      valueCol: Column,
      stratumCol: Column,
      seed: Int = 7
  ): DataFrame = {
    import graft.functions.Hashing
    val units = df
      .select(unitCol.cast("string").as("unit"),
        valueCol.cast("long").as("v"), stratumCol.cast("string").as("s"))
      .filter(col("unit").isNotNull && col("v").isNotNull && col("s").isNotNull)
      .groupBy("unit").agg(sum(col("v")).as("uv"), min(col("s")).as("s"))
      .withColumn("arm", pmod(Hashing.md5Hash32(seed, col("unit")), lit(2L)))
    val cells = units.groupBy("s").agg(
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("nt"),
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("nc"),
      sum(when(col("arm") === 1L, col("uv")).otherwise(0L)).as("st"),
      sum(when(col("arm") === 0L, col("uv")).otherwise(0L)).as("sc"))
      .withColumn("ok", expr("nt > 0 AND nc > 0"))
      .withColumn("d_milli", expr(
        "CASE WHEN ok THEN (CAST(st AS DECIMAL(38,0)) * nc" +
          " - CAST(sc AS DECIMAL(38,0)) * nt) * 1000" +
          " DIV (CAST(nt AS DECIMAL(38,0)) * nc) END"))
    cells.agg(
        sum(expr("nt + nc")).as("n_units"),
        sum(col("nt")).as("n_t"),
        sum(col("nc")).as("n_c"),
        sum(col("st").cast("decimal(38,0)")).as("sy_t"),
        sum(col("sc").cast("decimal(38,0)")).as("sy_c"),
        count(lit(1)).as("n_strata"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_strata_excluded"),
        sum(when(col("ok"), expr("(nt + nc)"))).as("n_inc"),
        sum(when(col("ok"),
          expr("CAST(nt + nc AS DECIMAL(38,0)) * d_milli"))).as("wsum"))
      .withColumn("delta_raw_milli", expr(
        "CASE WHEN n_t > 0 AND n_c > 0 THEN" +
          " (sy_t * n_c - sy_c * n_t) * 1000" +
          " DIV (CAST(n_t AS DECIMAL(38,0)) * n_c) END"))
      .withColumn("delta_post_milli", expr(
        "CASE WHEN n_inc > 0 THEN wsum DIV n_inc END"))
      .withColumn("srm_chi2_milli", expr(
        "CASE WHEN n_units > 0 THEN" +
          " (CAST(n_t - n_c AS DECIMAL(38,0)) * (n_t - n_c) * 1000)" +
          " DIV n_units END"))
      .withColumn("srm_suspect",
        when(col("srm_chi2_milli").isNotNull, col("srm_chi2_milli") >= 3841L))
      .select(col("n_units"), col("n_t").as("n_treat"),
        col("n_c").as("n_control"), col("n_strata"),
        col("n_strata_excluded"), col("delta_raw_milli"),
        col("delta_post_milli"), col("srm_chi2_milli"), col("srm_suspect"))
  }

  /** Uplift (Qini) decile curve — "if we could only treat the top x%,
    * whom should we pick": units are ranked by a targeting score,
    * split into deciles, and each PREFIX of deciles reports its
    * incremental conversions over control — the exact cleared Qini
    * numerator `qini_milli = (conv_t·n_c − conv_c·n_t)·1000 DIV n_c`
    * over CUMULATIVE cells, plus the per-decile uplift
    * `rate_t − rate_c` in ppm. A useless score gives a straight Qini
    * line to the corner; a good one bulges early.
    *
    * Determinism: arms are the md5 seed split ([[abChiSquare]]'s
    * convention); deciles are `ntile(10)` over the TOTAL order
    * `(score DESC, unit)` — unit is unique, so the tile assignment is
    * a pure function of the data and replays on any engine. The
    * ranking window is global — fine up to ~10⁸ per-unit aggregate
    * rows; past that use [[upliftDecilesHist]], the bit-identical
    * histogram-rank twin.
    *
    * Cells with an empty cumulative control arm report NULL qini.
    */
  def upliftDeciles(
      df: DataFrame,
      unitCol: Column,
      scoreCol: Column,
      convCol: Column,
      seed: Int = 7
  ): DataFrame =
    upliftCurve(upliftUnits(df, unitCol, scoreCol, convCol, seed)
      .withColumn("decile", ntile(10).over(
        Window.orderBy(col("score").desc, col("unit"))).cast("long")))

  /** [[upliftDeciles]]'s SCALE-SAFE twin (bit-identical output, pinned
    * in `StatsSpec` and oracle-gated as q321): the global `ntile(10)`
    * sort window over every unit is replaced by [[ntileHist]]'s exact
    * histogram ranks — `(score DESC, unit)` spelled as the negated
    * score ascending — so unit segmentation survives past ~10⁸ units
    * where a single-reducer sort window will not. (Negation is exact
    * for every score a cents-sum can reach; only Long.MinValue itself
    * has no negation.)
    */
  def upliftDecilesHist(
      df: DataFrame,
      unitCol: Column,
      scoreCol: Column,
      convCol: Column,
      seed: Int = 7
  ): DataFrame =
    upliftCurve(ntileHist(upliftUnits(df, unitCol, scoreCol, convCol, seed),
      10, -col("score"), col("unit"), "decile"))

  private def upliftUnits(
      df: DataFrame,
      unitCol: Column,
      scoreCol: Column,
      convCol: Column,
      seed: Int
  ): DataFrame = {
    import graft.functions.Hashing
    df
      .select(unitCol.cast("string").as("unit"),
        coalesce(scoreCol.cast("long"), lit(0L)).as("sc"),
        convCol.cast("boolean").as("cv"))
      .filter(col("unit").isNotNull)
      .groupBy("unit").agg(sum(col("sc")).as("score"),
        max(when(col("cv"), 1L).otherwise(0L)).as("y"))
      .withColumn("arm", pmod(Hashing.md5Hash32(seed, col("unit")), lit(2L)))
  }

  private def upliftCurve(units: DataFrame): DataFrame = {
    val cells = units.groupBy("decile").agg(
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("nt"),
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("nc"),
      sum(when(col("arm") === 1L, col("y")).otherwise(0L)).as("ct"),
      sum(when(col("arm") === 0L, col("y")).otherwise(0L)).as("cc"))
    val cum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("nt_cum", sum(col("nt")).over(cum))
      .withColumn("nc_cum", sum(col("nc")).over(cum))
      .withColumn("ct_cum", sum(col("ct")).over(cum))
      .withColumn("cc_cum", sum(col("cc")).over(cum))
      .withColumn("uplift_ppm", expr(
        "CASE WHEN nt > 0 AND nc > 0 THEN" +
          " (ct * 1000000) DIV nt - (cc * 1000000) DIV nc END"))
      .withColumn("qini_milli", expr(
        "CASE WHEN nc_cum > 0 THEN" +
          " (CAST(ct_cum AS DECIMAL(38,0)) * nc_cum" +
          "  - CAST(cc_cum AS DECIMAL(38,0)) * nt_cum) * 1000" +
          " DIV (CAST(nc_cum AS DECIMAL(38,0))) END"))
      .select(col("decile"), col("nt").as("n_treat"),
        col("nc").as("n_control"), col("ct").as("conv_treat"),
        col("cc").as("conv_control"), col("uplift_ppm"), col("qini_milli"))
      .orderBy("decile")
  }

  /** Delete-one-bucket jackknife SE for a RATIO metric — error bars
    * for clicks/views-style metrics where BOTH numerator and
    * denominator vary ([[poissonBootstrapCI]] covers means; ratios
    * need the jackknife, the standard production method): units hash
    * into `buckets` folds, each leave-one-out ratio
    * `r_b = (N−n_b)·10⁶ DIV (D−d_b)` gets ONE floor, and
    * `SE² = (B−1)·Σ(r_b·B − Σr)² DIV B³` (the cross-multiplied
    * jackknife variance — no mean division), rooted with the exact
    * [[isqrt]]. Bucketing is BY UNIT, so within-unit correlation
    * (the thing that breaks naive binomial SEs) is respected.
    *
    * Output (one row): numerator, denominator, `ratio_ppm`,
    * `n_buckets` (folds with a defined LOO ratio — a fold holding the
    * entire denominator is excluded), `se_ppm`, and the normal 95%
    * interval `ratio ± 196·se DIV 100`. NULL SE family when fewer
    * than 2 defined folds or a zero total denominator.
    *
    * Scale: unit-grain shuffle → `buckets` cells → two one-row
    * broadcasts. The fold count is configuration, never data-sized.
    */
  def jackknifeRatio(
      df: DataFrame,
      unitCol: Column,
      numCol: Column,
      denCol: Column,
      buckets: Int = 50,
      seed: Int = 23
  ): DataFrame = {
    require(buckets >= 2, "need at least two jackknife buckets")
    import graft.functions.Hashing
    val cells = df
      .select(unitCol.cast("string").as("unit"),
        coalesce(numCol.cast("long"), lit(0L)).as("x"),
        coalesce(denCol.cast("long"), lit(0L)).as("y"))
      .filter(col("unit").isNotNull)
      .withColumn("b", pmod(Hashing.md5Hash32(seed, col("unit")),
        lit(buckets.toLong)))
      .groupBy("b").agg(sum(col("x")).as("nb"), sum(col("y")).as("db"))
    val tot = cells.agg(sum(col("nb")).as("nn"), sum(col("db")).as("dd"))
    val loo = cells.crossJoin(broadcast(tot))
      .withColumn("r", expr(
        "CASE WHEN dd - db > 0 THEN" +
          " (CAST(nn - nb AS DECIMAL(38,0)) * 1000000) DIV (dd - db) END"))
      .filter(col("r").isNotNull)
    val s = loo.agg(sum(col("r")).as("sr"), count(lit(1)).as("beff"))
    val q = loo.crossJoin(broadcast(s))
      .agg(sum(expr(
        "(CAST(r AS DECIMAL(38,0)) * beff - sr)" +
          " * (CAST(r AS DECIMAL(38,0)) * beff - sr)")).as("sq"),
        max(col("beff")).as("beff"), max(col("sr")).as("sr"))
    q.crossJoin(broadcast(tot))
      .withColumn("ratio_ppm", expr(
        "CASE WHEN dd > 0 THEN (CAST(nn AS DECIMAL(38,0)) * 1000000)" +
          " DIV dd END"))
      .withColumn("var_ppm2", expr(
        "CASE WHEN beff >= 2 THEN ((beff - 1) * sq)" +
          " DIV (CAST(beff AS DECIMAL(38,0)) * beff * beff) END"))
      .withColumn("se_ppm", isqrt(col("var_ppm2")))
      .withColumn("ci_lo_ppm",
        expr("ratio_ppm - (196 * se_ppm) DIV 100"))
      .withColumn("ci_hi_ppm",
        expr("ratio_ppm + (196 * se_ppm) DIV 100"))
      .select(col("nn").as("numerator"), col("dd").as("denominator"),
        col("ratio_ppm"), col("beff").as("n_buckets"), col("se_ppm"),
        col("ci_lo_ppm"), col("ci_hi_ppm"))
  }

  /** Log-rank test between two arms' survival curves — the
    * significance test [[kaplanMeier]] curves are eyeballed for,
    * computed exactly: at each duration with ≥1 death, the treated
    * arm's observed deaths are compared with the expectation under
    * "no difference" (`E = d·n₁ DIV n` in micro lanes, one floor per
    * step) and the hypergeometric variance
    * `V = d·n₁·(n−n₁)·(n−d)·10⁶ DIV (n²·(n−1))` (one floor); the
    * statistic is `χ² = (ΣOE)²·1000 DIV (ΣV·10⁶)` against the
    * χ²₁ 3841-milli literal. Per-step floors make the whole test a
    * fixed integer recurrence both engines replay — the price is a
    * ≤1-milli statistic perturbation, paid identically on both sides.
    *
    * Units, lifespans, censoring: [[kaplanMeier]]'s convention (first
    * to last observed day; alive within `censorDays` of corpus end =
    * censored). Arms are the md5 seed split. Steps with n ≤ 1 carry
    * no information and are skipped.
    *
    * Output (one row): arm sizes, per-arm death counts, `oe_sum_micro`
    * (signed — positive means the TREATED arm died MORE than
    * expected), `var_sum_micro`, `chi2_milli`, `significant` (NULL
    * when the variance sum is zero — identical or empty curves).
    *
    * Scale: unit-grain shuffle → duration×arm cells (day-bounded) →
    * windows over the day-bounded grid. Nothing corpus-sized past the
    * first aggregate.
    */
  def logRank(
      df: DataFrame,
      unitCol: Column,
      tsCol: Column,
      censorDays: Int = 7,
      seed: Int = 7
  ): DataFrame = {
    require(censorDays >= 0, "censor window must be nonnegative")
    import graft.functions.Hashing
    val base = df
      .filter(unitCol.isNotNull && tsCol.isNotNull)
      .select(unitCol.cast("string").as("unit"),
        (unix_timestamp(tsCol).cast("long")).as("sec"))
      .withColumn("day", expr("sec DIV 86400"))
    val spans = base.groupBy("unit")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val maxDay = base.agg(max(col("day")).as("max_day"))
    val units = spans.crossJoin(broadcast(maxDay))
      .select(col("unit"), (col("d1") - col("d0")).as("dur"),
        when(col("d1") + censorDays <= col("max_day"), 1L).otherwise(0L)
          .as("death"))
      .withColumn("arm", pmod(Hashing.md5Hash32(seed, col("unit")), lit(2L)))
    // day-bounded cell table consumed by the grid, the risk windows AND
    // the arm totals — checkpoint stops the three consumers re-deriving
    // the unit-grain aggregate (the tvDrift idiom)
    val cells = units.groupBy("dur", "arm")
      .agg(count(lit(1)).as("n_all"), sum(col("death")).as("n_death"))
      .localCheckpoint(false)
    // complete durs × arms grid so each arm's at-risk is defined at
    // EVERY duration, then cumulative-from-above per arm
    val grid = cells.select(col("dur")).distinct()
      .crossJoin(df.sparkSession.range(2).select(col("id").as("arm")))
      .join(cells, Seq("dur", "arm"), "left")
      .na.fill(0L, Seq("n_all", "n_death"))
    val fromAbove = Window.partitionBy(col("arm")).orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val steps = grid
      .withColumn("nr", sum(col("n_all")).over(fromAbove))
      .groupBy("dur")
      .agg(max(when(col("arm") === 1L, col("nr"))).as("n1"),
        max(when(col("arm") === 0L, col("nr"))).as("n0"),
        max(when(col("arm") === 1L, col("n_death"))).as("d1"),
        max(when(col("arm") === 0L, col("n_death"))).as("d0"))
      .withColumn("n", expr("n1 + n0"))
      .withColumn("d", expr("d1 + d0"))
      .filter(col("d") > 0 && col("n") > 1)
      .withColumn("oe_micro", expr(
        "d1 * 1000000 - (CAST(d AS DECIMAL(38,0)) * n1 * 1000000) DIV n"))
      .withColumn("v_micro", expr(
        "(CAST(d AS DECIMAL(38,0)) * n1 * (n - n1) * (n - d) * 1000000)" +
          " DIV (CAST(n AS DECIMAL(38,0)) * n * (n - 1))"))
    // arm totals fold from the day-bounded cells — no second pass over
    // the unit table
    val armTotals = cells.agg(
      sum(when(col("arm") === 1L, col("n_all")).otherwise(0L)).as("n_treat"),
      sum(when(col("arm") === 0L, col("n_all")).otherwise(0L))
        .as("n_control"),
      sum(when(col("arm") === 1L, col("n_death")).otherwise(0L))
        .as("deaths_treat"),
      sum(when(col("arm") === 0L, col("n_death")).otherwise(0L))
        .as("deaths_control"))
    steps
      .agg(sum(col("oe_micro")).as("oe_sum_micro"),
        sum(col("v_micro")).as("var_sum_micro"))
      .crossJoin(broadcast(armTotals))
      .withColumn("chi2_milli", expr(
        "CASE WHEN var_sum_micro > 0 THEN" +
          " (CAST(oe_sum_micro AS DECIMAL(38,0)) * oe_sum_micro * 1000)" +
          " DIV (CAST(var_sum_micro AS DECIMAL(38,0)) * 1000000) END"))
      .withColumn("significant",
        when(col("chi2_milli").isNotNull, col("chi2_milli") >= 3841L))
      .select(col("n_treat"), col("n_control"), col("deaths_treat"),
        col("deaths_control"),
        expr("CAST(oe_sum_micro AS BIGINT)").as("oe_sum_micro"),
        expr("CAST(var_sum_micro AS BIGINT)").as("var_sum_micro"),
        expr("CAST(chi2_milli AS BIGINT)").as("chi2_milli"),
        col("significant"))
  }

  /** χ²₁ upper quantiles at `α = 0.05/k` for `k = 1..40` looks, in
    * milli — the Bonferroni multiple-testing ladder as INTEGER
    * LITERALS (entry 1 is the familiar 3841). Authoring-time erfc
    * bisection; shared verbatim with the oracle.
    */
  private[graft] val BonferroniChi2Milli: Seq[Long] = Seq(
    3841L, 5024L, 5731L, 6239L, 6635L, 6960L, 7237L, 7477L, 7689L,
    7879L, 8052L, 8210L, 8355L, 8490L, 8615L, 8733L, 8844L, 8948L,
    9047L, 9141L, 9230L, 9315L, 9397L, 9475L, 9550L, 9622L, 9691L,
    9758L, 9822L, 9885L, 9945L, 10003L, 10060L, 10115L, 10169L,
    10220L, 10271L, 10320L, 10368L, 10415L)

  /** Peeking-safe experiment trajectory — "WHEN did the test become
    * decisive, without p-hacking the daily look": the cumulative 2×2
    * table re-read at EVERY day of the experiment, with each day's
    * χ² judged against the Bonferroni-corrected threshold for the
    * TOTAL number of looks ([[BonferroniChi2Milli]] — a peek a day
    * for a month needs ~9.9, not 3.84). Naive daily peeking at 3841
    * inflates false positives ~3× over a month; this trajectory keeps
    * the family-wise rate at 5%.
    *
    * Units enter on their first observed day and convert on their
    * first converting day ([[abChiSquare]]'s max semantics,
    * cumulative); arms are the md5 seed split. Every readout is the
    * cleared integer χ² per cumulative table. More than 40 looks
    * reports NULL flags — refuse, don't lie.
    *
    * Scale: one unit-grain shuffle → (arm, day) entry/conversion cells
    * (day-bounded) → running windows over the days × 2 grid. Nothing
    * corpus-sized past the first aggregate.
    */
  def abTrajectory(
      df: DataFrame,
      unitCol: Column,
      convCol: Column,
      tsCol: Column,
      seed: Int = 7
  ): DataFrame = {
    import graft.functions.Hashing
    val us = df
      .filter(unitCol.isNotNull && tsCol.isNotNull && convCol.isNotNull)
      .select(unitCol.cast("string").as("unit"),
        convCol.cast("boolean").as("conv"),
        unix_timestamp(tsCol).cast("long").as("sec"))
      .withColumn("day", expr("sec DIV 86400"))
      .groupBy("unit")
      .agg(min(col("day")).as("entry_day"),
        min(when(col("conv"), col("day"))).as("conv_day"))
      .withColumn("arm", pmod(Hashing.md5Hash32(seed, col("unit")), lit(2L)))
    val bounds = us.agg(min(col("entry_day")).as("d0"),
      max(greatest(col("entry_day"), coalesce(col("conv_day"),
        col("entry_day")))).as("d1"))
    val ent = us.groupBy(col("arm"), col("entry_day").as("day"))
      .agg(count(lit(1)).as("n_ent"))
    val cnv = us.filter(col("conv_day").isNotNull)
      .groupBy(col("arm"), col("conv_day").as("day"))
      .agg(count(lit(1)).as("n_cnv"))
    val grid = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .crossJoin(df.sparkSession.range(2).select(col("id").as("arm")))
    val run = Window.partitionBy(col("arm")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cells = grid
      .join(ent, Seq("arm", "day"), "left")
      .join(cnv, Seq("arm", "day"), "left")
      .na.fill(0L, Seq("n_ent", "n_cnv"))
      .withColumn("n_cum", sum(col("n_ent")).over(run))
      .withColumn("c_cum", sum(col("n_cnv")).over(run))
    cells.groupBy("day")
      .agg(max(when(col("arm") === 1L, col("c_cum"))).as("a"),
        max(when(col("arm") === 1L, col("n_cum") - col("c_cum"))).as("b"),
        max(when(col("arm") === 0L, col("c_cum"))).as("c"),
        max(when(col("arm") === 0L, col("n_cum") - col("c_cum"))).as("d"))
      .withColumn("n_looks",
        count(lit(1)).over(Window.partitionBy()).cast("int"))
      .withColumn("threshold_milli",
        when(col("n_looks") <= BonferroniChi2Milli.length,
          element_at(typedlit(BonferroniChi2Milli), col("n_looks"))))
      .withColumn("chi2_milli", expr(
        "CASE WHEN (a+b) > 0 AND (c+d) > 0 AND (a+c) > 0 AND (b+d) > 0" +
          " AND (a+b+c+d) <= 10000000 THEN " +
          "CAST((CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)" +
          " * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)" +
          " * (a+b+c+d) * 1000" +
          " DIV (CAST(a+b AS DECIMAL(38,0)) * (c+d) * (a+c) * (b+d)) AS BIGINT)" +
          " END"))
      .withColumn("significant",
        when(col("chi2_milli").isNotNull && col("threshold_milli").isNotNull,
          col("chi2_milli") >= col("threshold_milli")))
      .select(col("day"), expr("a + b").as("n_treat"),
        expr("c + d").as("n_control"), col("a").as("conv_treat"),
        col("c").as("conv_control"), col("chi2_milli"),
        col("threshold_milli").cast("long").as("threshold_milli"),
        col("significant"))
      .orderBy("day")
  }

  /** Robust per-group outlier detection via MAD (median absolute
    * deviation): a value is an outlier iff `|x − median| > k · MAD` —
    * the standard heavy-tail-safe alternative to z-scores (one extreme
    * sensor reading inflates a stddev threshold into uselessness but
    * leaves the median/MAD untouched). Medians use q57's exact
    * rank-selection (value at rank ⌈n/2⌉ — "lower median", no
    * interpolation), so both engines select the identical element and
    * the whole result is hash-exact despite double-typed values.
    *
    * Output: `(key, n, med, mad, n_outliers)`. NULL values are
    * excluded up front (`n` counts non-null values): a NULL can be
    * neither the median nor an outlier, and leaving it in the rank
    * window would shift every rank by the engines' OPPOSITE null
    * orderings (Spark NULLS FIRST vs DuckDB NULLS LAST).
    *
    * Scale note: every pass shuffles on the group key; with a
    * LOW-cardinality key (event types) the per-key sort concentrates —
    * at that scale replace the rank-median with a fixed-width
    * histogram median ([[histogram]] + cumulative pick) or
    * approx_percentile, keeping the same MAD formula.
    */
  /** Seasonal (e.g. hour-of-day) baseline anomalies with an EXACT
    * integer 2σ test: per (key, season-cell) the population mean/stddev
    * over the cell's own history is the baseline, and an observation is
    * anomalous iff `|v − μ| > z·σ` — algebraically cleared of division
    * to `(n·v − S)² > z²·(n·Q − S²)` over BIGINT sums (S = Σv,
    * Q = Σv²), so the flag is engine-exact with no floating σ.
    * This is the calendar-seasonality companion to
    * [[graft.ops.TimeSeries.rollingAnomalies]] (trailing window) and
    * [[madOutliers]] (rank-robust): "is 3am traffic weird FOR 3am".
    *
    * Headroom: `(n·max|v|)² ≤ 2⁶³` → `n·max|v| ≤ 3·10⁹` per cell —
    * value-millis ≤ 10⁶ holds to ~3000 rows/cell; past that, cast the
    * cleared inequality to DECIMAL(38,0) (same plan, wider lanes).
    *
    * Scale shape: one aggregate to the per-cell sums (cells =
    * keys × 24, tiny), BROADCAST back onto the observations, one final
    * per-cell count — the observations shuffle once (the agg);
    * the flag pass is map-side.
    */
  def seasonalAnomalies(
      df: DataFrame,
      keyCol: Column,
      cellCol: Column,
      valueCol: Column,
      z: Long = 2L
  ): DataFrame = {
    require(z > 0, "z must be positive")
    val base = df.select(keyCol.as("key"), cellCol.cast("long").as("cell"),
        valueCol.cast("long").as("v"))
      .filter(col("key").isNotNull && col("cell").isNotNull && col("v").isNotNull)
    val stats = base.groupBy("key", "cell")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("q"))
    base.join(broadcast(stats), Seq("key", "cell"))
      .withColumn("__d", col("n") * col("v") - col("s"))
      .withColumn("__a",
        when(col("__d") * col("__d") >
          lit(z * z) * (col("n") * col("q") - col("s") * col("s")), 1L)
          .otherwise(0L))
      .groupBy("key", "cell")
      .agg(max(col("n")).as("n"), max(col("s")).as("__s"),
        sum(col("__a")).as("n_anomalies"))
      .withColumn("mean_micros",
        expr("(__s * 1000 - pmod(__s * 1000, n)) DIV n"))
      .drop("__s")
  }

  /** Gini concentration of `value` within each key — the corpus-balance
    * diagnostic ("is src7 one mega-document and crumbs?"): 0 = all docs
    * equal, →1 = one doc holds everything. Exact integer form of the
    * sorted-rank formula,
    * `gini_ppm = (2·Σᵢ i·xᵢ − (n+1)·Σx)·10⁶ div (n·Σx)` over ascending
    * ranks i — tie order cannot change the sum (equal x swap freely),
    * so the ppm is deterministic without a tie-break contract.
    * Requires non-negative values; keys with Σx = 0 are dropped (no
    * defined concentration).
    *
    * Scale shape: one per-key sort window (rank) + one aggregate on the
    * same partitioning — the q13 family. A low-cardinality key set
    * concentrates per-key sorts; at that scale pre-aggregate equal
    * values per key first (rank arithmetic over (value, count) runs
    * unchanged).
    *
    * Headroom: the ppm numerator is ≤ n·Σx·10⁶ — BIGINT holds to
    * n·Σx ≈ 9·10¹² per key (10⁶ docs × 10⁶ chars); past that run the
    * same formula over DECIMAL(38,0) (same plan, wider lanes).
    */
  def giniConcentration(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column
  ): DataFrame = {
    val base = df.select(keyCol.as("key"), valueCol.cast("long").as("v"))
      .filter(col("key").isNotNull && col("v").isNotNull)
    val w = Window.partitionBy(col("key")).orderBy(col("v"))
    base
      .withColumn("__i", row_number().over(w))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"),
        sum(col("__i") * col("v")).as("__iws"))
      .filter(col("total") > 0)
      .withColumn("gini_ppm", expr(
        "((2 * __iws - (n + 1) * total) * 1000000) DIV (n * total)"))
      .drop("__iws")
  }

  /** Pareto concentration points: the number of top entities that
    * cover 50% and 90% of the total — "how many customers are half
    * the revenue" with EXACT integer threshold tests
    * (`2·cum ≥ total`, `10·cum ≥ 9·total`: no percentage division
    * anywhere). One row out.
    *
    * Scale shape: the fact table collapses to one row per entity
    * first; the rank/cumsum window then sorts the ENTITY table
    * (cardinality-bounded, the [[graft.ops.Behavior.rfmSegments]]
    * contract) — descending value with an entity-id tie-break so the
    * cut is deterministic.
    */
  def paretoPoints(
      df: DataFrame,
      entityCol: Column,
      valueCol: Column
  ): DataFrame = {
    val per = df.select(entityCol.as("e"), valueCol.cast("long").as("v"))
      .filter(col("e").isNotNull && col("v").isNotNull)
      .groupBy("e").agg(sum(col("v")).as("tv"))
    val total = per.agg(sum(col("tv")).as("total"))
    val wc = Window.orderBy(col("tv").desc, col("e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wr = Window.orderBy(col("tv").desc, col("e"))
    per
      .withColumn("__cum", sum(col("tv")).over(wc))
      .withColumn("__rk", row_number().over(wr).cast("long"))
      .crossJoin(broadcast(total))
      .agg(count(lit(1)).as("n_entities"), max(col("total")).as("total"),
        min(when(col("__cum") * 2 >= col("total"), col("__rk"))).as("n_for_half"),
        min(when(col("__cum") * 10 >= col("total") * 9, col("__rk"))).as("n_for_90"))
  }

  /** Per-key quantile transform: exact B-quantile thresholds extracted
    * ONCE per key (the q57 rank-pick convention: threshold q is the
    * value at rank `ceil(n·q/B)`), then every row assigned its bucket
    * map-side as `1 + #{thresholds < v}` — ties share a bucket (unlike
    * ntile's row-order split), which is what a quantile FEATURE wants:
    * equal inputs must get equal codes. This is the train-once/
    * apply-everywhere quantile bucketizer (and the scaladoc'd
    * threshold fallback [[graft.ops.Behavior.rfmSegments]] points to).
    *
    * Scale shape: one per-key sort window for the thresholds, then the
    * assignment joins each row to its key's ≤(B−1)-element threshold
    * ARRAY (keys × (B−1) cells — broadcastable) and counts exceedances
    * inside codegen — the second pass never sorts.
    */
  def quantileBuckets(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      buckets: Int
  ): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val base = df.select(keyCol.as("key"), valueCol.cast("long").as("v"))
      .filter(col("key").isNotNull && col("v").isNotNull)
    val wr = Window.partitionBy(col("key")).orderBy(col("v"))
    val wn = Window.partitionBy(col("key"))
    val ranked = base
      .withColumn("__rn", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(wn))
    // threshold ranks ⌈n·q/B⌉ as integer ceil-division (n·q + B − 1)
    // DIV B — never ceil(n * double), whose IEEE representation of q/B
    // can land a hair above the exact rational and bump the rank by one
    val thresholds = (1 until buckets).map { q =>
      max(when(col("__rn") ===
        expr(s"(__n * $q + ${buckets - 1}) DIV $buckets"), col("v")))
        .as(s"__t$q")
    }
    val th = ranked.groupBy("key")
      .agg(thresholds.head, thresholds.tail: _*)
      .withColumn("__ts", array((1 until buckets).map(q => col(s"__t$q")): _*))
      .select(col("key"), col("__ts"))
    base.join(broadcast(th), Seq("key"))
      .withColumn("bucket",
        lit(1L) + size(filter(col("__ts"), t => col("v") > t)).cast("long"))
      .select(col("key"), col("v"), col("bucket"))
  }

  def madOutliers(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      k: Double = 3.0
  ): DataFrame = {
    val base = df.select(keyCol.as("key"), valueCol.as("v"))
      .filter(col("v").isNotNull)
    val wr = Window.partitionBy(col("key")).orderBy(col("v"))
    val wn = Window.partitionBy(col("key"))
    val med = base
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy("key")
      // median rank ⌈n/2⌉ as integer ceil-division (n+1) DIV 2 — the
      // house convention; ceil(n·0.5) doubles are IEEE-exact for .5 but
      // the integer spelling keeps the whole rank family uniform
      .agg(max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 1) DIV 2"), col("v"))).as("med"))
    val dev = base.join(med, Seq("key"))
      .withColumn("dev", abs(col("v") - col("med")))
    val wd = Window.partitionBy(col("key")).orderBy(col("dev"))
    val mad = dev
      .withColumn("rn2", row_number().over(wd))
      .groupBy("key")
      .agg(max(when(col("rn2") === expr("(n + 1) DIV 2"), col("dev"))).as("mad"))
    dev.join(mad, Seq("key"))
      .groupBy("key")
      .agg(max(col("n")).as("n"), max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(k) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Weighted percentiles per key — the smallest value whose CUMULATIVE
    * weight reaches the `p/10` share of the key's total weight, for each
    * requested `pTenths` entry (5 = weighted median, 9 = weighted p90).
    * The threshold test is the division-cleared integer form
    * `10·cumw ≥ p·W` over BIGINT weights, so no quantile is ever an IEEE
    * boundary call. This is the percentile a token-weighted corpus
    * audit actually wants: "the median DOCUMENT length" and "the length
    * of the median TOKEN's document" differ exactly by this weighting.
    *
    * Determinism under ties: equal values may enter the running sum in
    * any order, but the threshold can only cross INSIDE a run of equal
    * values, and the reported `min` over qualifying rows is that run's
    * value either way — the output never depends on tie order.
    *
    * Output: `key`, `w_total`, one `p{t}0` column per requested tenth.
    * NULL values/weights are excluded, and the positive-weight
    * contract is ENFORCED (`wt > 0` filter): a zero or negative weight
    * would make the running `cumw` non-monotonic, voiding both the
    * quantile semantics and the tie-order argument above — such rows
    * carry no mass by definition and are dropped, not propagated.
    * Scale: one shuffle on the key; the per-key running sum is the
    * usual sort-based window (no global window).
    */
  def weightedPercentiles(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      weightCol: Column,
      pTenths: Seq[Int]
  ): DataFrame = {
    require(pTenths.nonEmpty && pTenths.forall(t => t >= 1 && t <= 9),
      "pTenths must be within 1..9")
    val base = df.select(keyCol.as("key"), valueCol.as("v"),
        weightCol.cast("long").as("wt"))
      .filter(col("v").isNotNull && col("wt") > 0L)
    val wc = Window.partitionBy(col("key")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(col("key"))
    base
      .withColumn("cumw", sum(col("wt")).over(wc))
      .withColumn("tot", sum(col("wt")).over(wn))
      .groupBy("key")
      .agg(max(col("tot")).as("w_total"),
        pTenths.map(t =>
          min(when(col("cumw") * 10 >= col("tot") * t, col("v")))
            .as(s"p${t}0")): _*)
  }

  /** Exact top-N keys by row count plus ONE `otherLabel` rollup row for
    * everything else — the bounded-output group-by a dashboard or
    * report actually wants over an unbounded key domain: the result is
    * always ≤ N+1 rows no matter how many distinct keys the data
    * grows, and nothing is approximate (the rollup row carries the
    * exact residual mass and how many keys were folded into it,
    * `n_keys`). Ties at the cut break by key ascending, so the cut is
    * total and reproducible.
    *
    * Scale: one shuffle to key counts, then a TakeOrderedAndProject
    * top-N (per-partition top-N + driver merge — no global sort, no
    * single-partition window) and a broadcast anti join for the
    * residual. Keys are compared as strings so the rollup label can
    * live in the same column.
    */
  def topNWithOther(
      df: DataFrame,
      keyCol: Column,
      n: Int,
      otherLabel: String = "__other__"
  ): DataFrame = {
    require(n >= 1, "n must be positive")
    val counts = df.groupBy(keyCol.cast("string").as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val top = counts.orderBy(col("n_rows").desc, col("key")).limit(n)
    val other = counts
      .join(broadcast(top.select("key")), Seq("key"), "left_anti")
      .agg(sum(col("n_rows")).as("n_rows"), count(lit(1)).as("n_keys"))
      .filter(col("n_keys") > 0)
      .select(lit(otherLabel).as("key"), col("n_rows"), col("n_keys"))
    top.withColumn("n_keys", lit(1L)).unionByName(other)
  }

  /** A/B experiment readout with an EXACT chi-square significance test —
    * no doubles anywhere a boundary could flip: units are assigned to
    * arms by the portable md5 hash (so the assignment is reproducible
    * on any engine — and in the oracle), outcomes aggregate to the 2×2
    * table (a,b,c,d), and the 1-df chi-square statistic
    * `n·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))` is compared in milli-units
    * via DECIMAL(38,0) integer division — the numerator squares past
    * 2⁶³ long before the table is big. `significant` is the exact test
    * `chi2_milli ≥ 3841` (α = 0.05 critical value 3.841, floored to
    * the same milli grid).
    *
    * Exactness bound: the numerator `(ad−bc)²·n·1000` stays inside
    * DECIMAL(38,0) only for `n ≤ 10⁷` units (worst case 62.5·n⁵ ≤
    * 10³⁸). Beyond that Spark would yield NULL while the HUGEINT
    * oracle errors, so the operator guards on `n` EXPLICITLY: tables
    * over 10⁷ units report NULL chi2 deterministically on both
    * engines (a data-independent bound, not a value lottery). At that
    * population a fixed-significance chi-square readout is the wrong
    * instrument anyway — every microscopic lift is "significant";
    * pre-aggregate or test effect size instead.
    *
    * Output (one row): arm sizes, conversions, per-arm ppm rates, the
    * rate lift, `chi2_milli`, `significant`. Degenerate margins (an
    * empty arm or an all/none outcome) report NULL chi2 — the test is
    * undefined, not zero.
    *
    * Scale: one shuffle to unit grain, then a single aggregate to one
    * row; the hash assignment is map-side.
    */
  def abChiSquare(
      df: DataFrame,
      unitCol: Column,
      convertedCol: Column,
      seed: Int = 7
  ): DataFrame = {
    import graft.functions.Hashing
    val units = df
      .select(unitCol.cast("string").as("unit"), convertedCol.as("conv"))
      .filter(col("unit").isNotNull)
      .groupBy("unit")
      .agg(max(when(col("conv"), 1L).otherwise(0L)).as("y"))
      .withColumn("arm", pmod(Hashing.md5Hash32(seed, col("unit")), lit(2L)))
    val cells = units.agg(
      sum(when(col("arm") === 1 && col("y") === 1, 1L).otherwise(0L)).as("a"),
      sum(when(col("arm") === 1 && col("y") === 0, 1L).otherwise(0L)).as("b"),
      sum(when(col("arm") === 0 && col("y") === 1, 1L).otherwise(0L)).as("c"),
      sum(when(col("arm") === 0 && col("y") === 0, 1L).otherwise(0L)).as("d"))
    abReadoutFromCells(cells)
  }

  /** The [[abChiSquare]] readout applied to an already-built one-row
    * 2×2 cell frame `(a, b, c, d)` — the shared tail that keeps the
    * batch test and the streaming cell-delta fold
    * ([[graft.streaming.StatefulOps.abCellsStream]]) on IDENTICAL
    * readout arithmetic by construction.
    */
  private[graft] def abReadoutFromCells(cells: DataFrame): DataFrame = {
    cells
      .withColumn("n_treat", col("a") + col("b"))
      .withColumn("n_control", col("c") + col("d"))
      .withColumn("rate_treat_ppm",
        when(col("n_treat") > 0, expr("(a * 1000000) DIV (a + b)")))
      .withColumn("rate_control_ppm",
        when(col("n_control") > 0, expr("(c * 1000000) DIV (c + d)")))
      .withColumn("lift_ppm", col("rate_treat_ppm") - col("rate_control_ppm"))
      .withColumn("chi2_milli", expr(
        "CASE WHEN (a+b) > 0 AND (c+d) > 0 AND (a+c) > 0 AND (b+d) > 0" +
          " AND (a+b+c+d) <= 10000000 THEN " +
          "CAST((CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)" +
          " * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)" +
          " * (a+b+c+d) * 1000" +
          " DIV (CAST(a+b AS DECIMAL(38,0)) * (c+d) * (a+c) * (b+d)) AS BIGINT)" +
          " END"))
      .withColumn("significant",
        when(col("chi2_milli").isNotNull, col("chi2_milli") >= 3841L))
      .select("n_treat", "n_control", "a", "c",
        "rate_treat_ppm", "rate_control_ppm", "lift_ppm",
        "chi2_milli", "significant")
      .withColumnRenamed("a", "conv_treat")
      .withColumnRenamed("c", "conv_control")
  }

  /** Per-group ECDF in exact ppm — every row's value mapped to its
    * group's empirical `P(X ≤ x)`: `ecdf_ppm = count(≤ x)·10⁶ DIV n`.
    * This is the rank-based calibration that makes scores COMPARABLE
    * across groups with different distributions ("is this document
    * good FOR ITS SOURCE"): a raw threshold keeps different fractions
    * of each source, the ECDF keeps the same fraction of each by
    * construction. Ties share one ECDF value (the RANGE frame includes
    * peers — count-≤, the textbook ECDF), so equal scores can never
    * straddle a downstream cut.
    *
    * Scale: [[cumHistByKey]]'s keyed histogram ranks — the count-≤ of a
    * value is exactly its cell's inclusive cumulative end `__ce`, ties
    * share a cell by construction, and no per-key sort window exists
    * anywhere (the window formulation this replaces put a dominant
    * source's whole slice through one reducer).
    */
  def groupEcdf(
      df: DataFrame,
      idCol: Column,
      keyCol: Column,
      valueCol: Column
  ): DataFrame = {
    val base = df.select(idCol.as("id"), keyCol.as("key"),
        valueCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
    val cells = cumHistByKey(base, col("key"), col("v"))
      .withColumn("ecdf_ppm", expr("(__ce * 1000000) DIV __n"))
      .select(col("__k").as("__hk"), col("__v").as("__hv"),
        col("__n").as("n"), col("ecdf_ppm"))
    base.join(cells, col("key") <=> col("__hk") && col("v") === col("__hv"))
      .select(col("id"), col("key"), col("v"), col("n"), col("ecdf_ppm"))
  }

  /** Trimmed mean per key — the robust location estimate that survives
    * fat tails without the full quantile machinery: drop the lowest and
    * highest `trimTenths/10` of each key's values BY RANK (exactly
    * `t = ⌊n·trimTenths/10⌋` rows off each end, integer floor — never a
    * percentage boundary judgement call) and average the rest with
    * floor division. Rank ties inside the value order are broken
    * arbitrarily, which cannot change the result: whichever copies of a
    * tied value fall inside the kept band, the kept MULTISET is the
    * same.
    *
    * Output per key: `n`, `n_kept`, `trimmed_mean` (integer units of
    * the input; the final division TRUNCATES toward zero — Spark `DIV`
    * and DuckDB integer `//` agree on that for negative sums, unlike
    * floor). One shuffle; rank and count share the key window.
    */
  /** Winsorized mean per key — [[trimmedMean]]'s clip-don't-drop
    * sibling, the standard training-pipeline preprocessing for heavy
    * tails: values below the `tailTenths`-decile bound CLAMP to it
    * (likewise above the mirrored upper bound) instead of leaving the
    * sample, so n is preserved and every row still votes — just not
    * with an outlier's weight. Bounds are exact rank-selected order
    * statistics (`lo = value at rank t+1, hi = at rank n−t,
    * t = n·tailTenths DIV 10` — value-deterministic under ties), the
    * mean is the truncating integer DIV, and `n_clamped` reports how
    * much winsorizing actually happened.
    *
    * Scale: one shuffle on the key; the rank and count windows share
    * its sort ([[trimmedMean]]'s plan shape).
    */
  def winsorizedMean(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      tailTenths: Int = 1
  ): DataFrame = {
    require(tailTenths >= 0 && tailTenths <= 4, "tailTenths must be in 0..4")
    val base = df.select(keyCol.as("key"), valueCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
    val wr = Window.partitionBy(col("key")).orderBy(col("v"))
    val wn = Window.partitionBy(col("key"))
    base
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("__t", expr(s"(n * $tailTenths) DIV 10"))
      .withColumn("lo", max(when(col("rn") === col("__t") + 1, col("v")))
        .over(wn))
      .withColumn("hi", max(when(col("rn") === col("n") - col("__t"),
        col("v"))).over(wn))
      .withColumn("w", greatest(col("lo"), least(col("hi"), col("v"))))
      .groupBy("key")
      .agg(max(col("n")).as("n"),
        max(col("lo")).as("lo_bound"),
        max(col("hi")).as("hi_bound"),
        sum(when(col("w") =!= col("v"), 1L).otherwise(0L)).as("n_clamped"),
        expr("sum(w) DIV count(1)").as("winsorized_mean"))
  }

  def trimmedMean(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      trimTenths: Int = 1
  ): DataFrame = {
    require(trimTenths >= 0 && trimTenths <= 4, "trimTenths must be in 0..4")
    val base = df.select(keyCol.as("key"), valueCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
    val wr = Window.partitionBy(col("key")).orderBy(col("v"))
    val wn = Window.partitionBy(col("key"))
    base
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("__t", expr(s"(n * $trimTenths) DIV 10"))
      .filter(col("rn") > col("__t") && col("rn") <= col("n") - col("__t"))
      .groupBy("key")
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_kept"),
        expr("sum(v) DIV count(1)").as("trimmed_mean"))
  }

  /** r×c contingency independence audit — "is column B independent of
    * column A" (is language independent of source? label of split?)
    * with the Pearson chi-square computed EXACTLY: per cell,
    * `(O·n − r·c)² · 10⁶ / (r·c·n)` in DECIMAL(38,0) micro units (the
    * squared numerator passes 2⁶³ around 60k rows), plus a `__total__`
    * row carrying the statistic's exact sum and the degrees of freedom
    * `(R−1)(C−1)` — the two numbers a significance lookup needs, with
    * no IEEE boundary anywhere. Per-cell expected counts ride along in
    * milli units, so the audit also SHOWS which cells drive the
    * dependence.
    *
    * Scale: one shuffle to the (a, b) cell table; margins and totals
    * are windows over that R×C-bounded table (the q230 benign class).
    */
  def contingencyAudit(
      df: DataFrame,
      aCol: Column,
      bCol: Column
  ): DataFrame = {
    val cells = df.filter(aCol.isNotNull && bCol.isNotNull)
      .groupBy(aCol.cast("string").as("a"), bCol.cast("string").as("b"))
      .agg(count(lit(1)).as("n_obs"))
    val wa = Window.partitionBy(col("a"))
    val wb = Window.partitionBy(col("b"))
    val wAll = Window.partitionBy()
    val scored = cells
      .withColumn("__r", sum(col("n_obs")).over(wa))
      .withColumn("__c", sum(col("n_obs")).over(wb))
      .withColumn("__n", sum(col("n_obs")).over(wAll))
      // DECIMAL(38,0) lanes like chi2_micro: the plain-BIGINT product
      // __r·__c·1000 silently wraps in non-ANSI Spark past ~9.2e15
      // (margin products a 100 TB corpus reaches), while the HUGEINT
      // oracle errors — widen first, truncate after the division
      .withColumn("exp_milli", expr(
        "CAST((CAST(__r AS DECIMAL(38,0)) * __c * 1000) DIV __n AS BIGINT)"))
      .withColumn("chi2_micro", expr(
        "CAST((CAST(n_obs AS DECIMAL(38,0)) * __n - CAST(__r AS DECIMAL(38,0)) * __c)" +
          " * (CAST(n_obs AS DECIMAL(38,0)) * __n - CAST(__r AS DECIMAL(38,0)) * __c)" +
          " * 1000000 DIV (CAST(__r AS DECIMAL(38,0)) * __c * __n) AS BIGINT)"))
      // DISTINCT aggregates are unsupported in windows; collect_set is
      .withColumn("__df",
        (size(collect_set(col("a")).over(wAll)).cast("long") - 1L) *
          (size(collect_set(col("b")).over(wAll)).cast("long") - 1L))
    val total = scored.groupBy()
      .agg(max(col("__n")).as("n_obs"), sum(col("chi2_micro")).as("chi2_micro"),
        max(col("__df")).as("dof"))
      .select(lit("__total__").as("a"), lit("__total__").as("b"),
        col("n_obs"), lit(null).cast("long").as("exp_milli"),
        col("chi2_micro"), col("dof"))
    scored
      .select(col("a"), col("b"), col("n_obs"), col("exp_milli"),
        col("chi2_micro"), lit(null).cast("long").as("dof"))
      .unionByName(total)
  }

  /** Model calibration buckets (the reliability diagram as data): ppm
    * scores in `[0, 10⁶]` binned into `buckets` equal-width bins, each
    * bin reporting its population, mean predicted score, and OBSERVED
    * positive rate — a well-calibrated scorer has `mean_score_ppm ≈
    * pos_ppm` per bin, and the quality-filter threshold should be read
    * off this table, not guessed. All integer arithmetic: bin =
    * `score·B div (10⁶+1)` (the +1 keeps the 10⁶ maximum in the last
    * bin with no clamp branch, the q164 histogram convention); means
    * and rates are integral divisions. NULL scores/labels are excluded
    * — an unscored row says nothing about calibration. Empty bins are
    * absent (observed, not theoretical, like [[Profile.histogram]]).
    *
    * Scale shape: ONE aggregate over a map-side bin projection,
    * ≤`buckets` cells shipped per task — calibration of a 100 TB
    * corpus costs one scan.
    */
  def calibrationBuckets(
      df: DataFrame,
      scorePpmCol: Column,
      labelCol: Column,
      buckets: Int = 10
  ): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    df.select(scorePpmCol.cast("long").as("__s"),
        labelCol.cast("boolean").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .withColumn("bin", expr(s"(__s * $buckets) DIV 1000001"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        expr("sum(__s) DIV count(1)").as("mean_score_ppm"),
        sum(col("__y").cast("long")).as("n_pos"))
      .withColumn("pos_ppm", expr("(n_pos * 1000000) DIV n"))
  }

  /** 2-D skyline (Pareto front): the input rows not DOMINATED by any
    * other row, where `q` dominates `p` iff `q.cost ≤ p.cost ∧
    * q.gain ≥ p.gain` with at least one strict — the classic
    * non-dominated-set operator (Börzsönyi et al., "The Skyline
    * Operator", ICDE 2001) Spark has no built-in for. Duplicate
    * `(cost, gain)` points do not dominate each other (no strict edge),
    * so all copies of a skyline point survive.
    *
    * Scale shape — NOT the quadratic NOT-EXISTS self-join: in 2-D the
    * skyline is a monotone staircase, so (1) one hash aggregate
    * collapses the corpus to its distinct cost levels (`max(gain)` per
    * cost — everything below is dominated within the level), (2) a
    * prefix-max over the cost-sorted LEVEL table marks the staircase
    * corners (`gain` must strictly exceed every cheaper level's best),
    * and (3) the corner set broadcasts back onto the scan as an
    * equi-join. The corpus is touched by aggregate + map-side join
    * only; the single-partition window runs over DISTINCT cost levels —
    * the same bounded-NDV trade as [[quantileBuckets]]'s threshold
    * table (price grids, size classes, score scales: thousands, not
    * corpus-sized — past that, range-partition the level table and
    * two-pass the prefix max).
    */
  /** Population-stability-index drift between a REFERENCE distribution
    * and a CURRENT one — the standard ML-monitoring score for "has this
    * feature's distribution moved since training": equi-width bins are
    * FROZEN from the reference (the monitoring convention — a moving
    * grid hides drift), current values outside the reference range
    * clamp into the edge bins, and
    * `PSI = Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ)` accumulates per bin. Rule-of-thumb
    * thresholds: < 0.10 stable, 0.10–0.25 drifting, > 0.25 shifted
    * (psi_micro: 100 000 / 250 000).
    *
    * Exactness: bins via [[Profile.histogram]]'s clamp-free integer
    * formula (headroom: `(hi−lo)·bins < 2⁶³`), shares as
    * Laplace-smoothed integer ppm `(n+1)·10⁶ div (N+bins)` (zero bins
    * stay defined on both sides), and only the final `ln` of the two
    * ppm INTEGERS is double math — the [[graft.ext.TextOps]] bigram-LM
    * precedent for cross-engine-stable logs. `psi_micro` is the
    * per-bin contribution in millionths; consumers sum it.
    *
    * Scale shape: one aggregate per side + a one-row range broadcast —
    * drift-checking a 100 TB feature costs two scans, no shuffle wider
    * than `bins` cells per task.
    */
  def psiDrift(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: Column,
      bins: Int = 10
  ): DataFrame = {
    require(bins > 0, "bins must be positive")
    val r = ref.select(floor(valueCol).cast("long").as("x"))
      .filter(col("x").isNotNull)
    val c = cur.select(floor(valueCol).cast("long").as("x"))
      .filter(col("x").isNotNull)
    val range = r.agg(min(col("x")).as("lo"), max(col("x")).as("hi"),
      count(lit(1)).as("__nr"))
    val curTot = c.agg(count(lit(1)).as("__nc"))
    def binned(df: DataFrame, out: String) =
      df.crossJoin(broadcast(range.select("lo", "hi")))
        .withColumn("bin", least(lit(bins - 1L), greatest(lit(0L),
          expr(s"((x - lo) * $bins) DIV (hi - lo + 1)"))))
        .groupBy("bin").agg(count(lit(1)).as(out))
    range.select(explode(sequence(lit(0L), lit(bins - 1L))).as("bin"),
        col("lo"), col("hi"), col("__nr"))
      .crossJoin(broadcast(curTot))
      .join(binned(r, "n_ref"), Seq("bin"), "left")
      .join(binned(c, "n_cur"), Seq("bin"), "left")
      .withColumn("n_ref", coalesce(col("n_ref"), lit(0L)))
      .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
      .withColumn("bin_lo",
        col("lo") + expr(s"(bin * (hi - lo + 1)) DIV $bins"))
      .withColumn("p_ppm", expr(s"((n_ref + 1) * 1000000) DIV (__nr + $bins)"))
      .withColumn("q_ppm", expr(s"((n_cur + 1) * 1000000) DIV (__nc + $bins)"))
      .withColumn("psi_micro",
        floor((col("p_ppm") - col("q_ppm")).cast("double") *
          (log(col("p_ppm").cast("double")) - log(col("q_ppm").cast("double"))))
          .cast("long"))
      .select("bin", "bin_lo", "n_ref", "n_cur", "p_ppm", "q_ppm", "psi_micro")
  }

  /** One-way ANOVA F readout in exact integer lanes (Fisher 1925): per
    * key, does the metric's MEAN differ across the groups — the k-arm
    * generalization of the two-sample t readout, computed entirely
    * from the sufficient statistics `(n_g, Σv, Σv²)` so it is one
    * hash-aggregate pass at any scale. Sums of squares are carried
    * with a DOCUMENTED floor per group (`S_g² DIV n_g` — absolute
    * error < 1 per group against squared-sum magnitudes ≥ 1e10,
    * identical in both engines because the oracle shares the literal;
    * NOT scaled up further, so the DIV result stays inside BIGINT for
    * any |v| ≤ 1e6-lane metric to n ≈ 1e9 rows — pre-aggregate
    * beyond):
    * `between = max(Σ_g (S_g² DIV n_g) − (S² DIV n), 0)` — clamped at
    * zero because at small magnitudes the k-group floor error can push
    * the raw difference below zero (groups {1,2},{1,2}: gsum=8,
    * S² DIV n=9), and a negative between-sum is a nonsensical readout
    * (true between-SS is ≥ 0; the clamp is replayed by the oracle) —
    * `within = Q − Σ_g (S_g² DIV n_g)`, then
    * `F_milli = (between·(n−k)·1000) DIV (within·(k−1))` and
    * `eta2_ppm = between·1e6 DIV (between+within)` (the effect size —
    * report it WITH the test, the [[cuped]]-family convention). All
    * products run in DECIMAL(38,0); only bounded ratios are output.
    * NULL F when within-variance is zero or k < 2 (the test is
    * undefined, not zero).
    *
    * Scale: one shuffle to (key, group) grain, one to key grain —
    * the canonical two-level aggregate; no row² anywhere.
    */
  def anovaF(
      df: DataFrame,
      keyCol: Column,
      groupCol: Column,
      valueCol: Column
  ): DataFrame = {
    val d38 = "DECIMAL(38,0)"
    val groups = df
      .filter(keyCol.isNotNull && groupCol.isNotNull && valueCol.isNotNull)
      .select(keyCol.as("key"), groupCol.as("grp"),
        valueCol.cast("long").as("v"))
      .groupBy("key", "grp")
      .agg(count(lit(1)).as("ng"), sum(col("v")).as("sg"),
        sum(expr(s"CAST(v AS $d38) * v")).as("qg"))
    groups.groupBy("key")
      .agg(count(lit(1)).as("k_groups"),
        sum(col("ng")).as("n"),
        sum(col("sg")).as("__s"),
        sum(col("qg")).as("__q"),
        sum(expr(s"(CAST(sg AS $d38) * sg) DIV ng")).as("__gsum"))
      .withColumn("__between",
        expr(s"greatest(__gsum - (CAST(__s AS $d38) * __s) DIV n," +
          s" CAST(0 AS $d38))"))
      .withColumn("__within", expr("__q - __gsum"))
      .withColumn("f_milli",
        when(col("k_groups") >= 2 && col("__within") > 0, expr(
          "CAST((__between * (n - k_groups) * 1000)" +
            " DIV (__within * (k_groups - 1)) AS BIGINT)")))
      .withColumn("eta2_ppm",
        when(col("__between") + col("__within") > 0, expr(
          "CAST((__between * 1000000) DIV (__between + __within) AS BIGINT)")))
      .select("key", "k_groups", "n", "f_milli", "eta2_ppm")
  }

  /** Cochran–Armitage trend test (Cochran 1954; Armitage 1955): per
    * key, is there a MONOTONE trend in a binary outcome's rate across
    * ORDERED dose levels — the right test when the grouping has an
    * order (bucketed exposure, time-of-day bands), where an omnibus
    * chi² wastes power ignoring it. With dose weights `w_i = level`,
    * level sizes `n_i`, successes `r_i`, totals `n`, `R`:
    * `Z² = N_t²·n / (R(n−R)(nB − A²))` where `N_t = n·Σw_i r_i −
    * R·Σw_i n_i`, `A = Σw_i n_i`, `B = Σw_i² n_i` — all exact
    * integers (DECIMAL(38,0) lanes), no floors until the final
    * reported ratio. Cleared test at α=0.05:
    * `significant ⟺ 10000·N_t²·n > 38416·R(n−R)(nB−A²)`, the
    * [[abChiSquare]] convention, with the same explicit n ≤ 10⁷
    * exactness guard (beyond it, pre-aggregate). Degenerate margins
    * (all/none successes, single level) report NULL.
    *
    * Output per key: `n`, `n_levels`, `successes`,
    * `z2_signed_milli` (sign = trend direction), `significant`.
    * Scale: two-level hash aggregate, same shape as [[anovaF]].
    */
  def cochranArmitage(
      df: DataFrame,
      keyCol: Column,
      doseCol: Column,
      outcomeCol: Column
  ): DataFrame = {
    val d38 = "DECIMAL(38,0)"
    val levels = df
      .filter(keyCol.isNotNull && doseCol.isNotNull && outcomeCol.isNotNull)
      .select(keyCol.as("key"), doseCol.cast("long").as("w"),
        when(outcomeCol, 1L).otherwise(0L).as("y"))
      .groupBy("key", "w")
      .agg(count(lit(1)).as("ni"), sum(col("y")).as("ri"))
    levels.groupBy("key")
      .agg(count(lit(1)).as("n_levels"),
        sum(col("ni")).as("n"),
        sum(col("ri")).as("successes"),
        sum(expr(s"CAST(w AS $d38) * ri")).as("__swr"),
        sum(expr(s"CAST(w AS $d38) * ni")).as("__a"),
        sum(expr(s"CAST(w AS $d38) * w * ni")).as("__b"))
      .withColumn("__nt",
        expr(s"CAST(n AS $d38) * __swr - CAST(successes AS $d38) * __a"))
      .withColumn("__var",
        expr(s"CAST(successes AS $d38) * (n - successes)" +
          s" * (CAST(n AS $d38) * __b - __a * __a)"))
      .withColumn("z2_signed_milli",
        when(col("n_levels") >= 2 && col("__var") > 0 && col("n") <= 10000000L,
          expr("CAST(CASE WHEN __nt < 0 THEN -1 ELSE 1 END" +
            " * ((__nt * __nt * n * 1000) DIV __var) AS BIGINT)")))
      .withColumn("significant",
        when(col("z2_signed_milli").isNotNull,
          expr("10000 * __nt * __nt * n > 38416 * __var")))
      .select("key", "n", "n_levels", "successes", "z2_signed_milli",
        "significant")
  }

  def skyline2D(df: DataFrame, costCol: String, gainCol: String): DataFrame = {
    val levels = df.groupBy(col(costCol))
      .agg(max(col(gainCol)).as("__bg"))
    val corners = levels
      .withColumn("__pb", max(col("__bg")).over(
        Window.orderBy(col(costCol))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("__pb").isNull || col("__bg") > col("__pb"))
      .select(col(costCol), col("__bg").as(gainCol))
    df.join(broadcast(corners), Seq(costCol, gainCol), "left_semi")
  }
}
