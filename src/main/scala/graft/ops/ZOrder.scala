package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaved sort keys — multi-dimensional data
  * clustering for the corpus layout path: range-sharding on a single
  * column ([[graft.io.CorpusWriter.shardPlan]]) gives parquet footers
  * that prune on ONE dimension only; sorting on the interleaved key
  * keeps rows close in BOTH dimensions inside the same files, so
  * min/max zone maps prune two-predicate scans (the Delta/Iceberg
  * OPTIMIZE ZORDER idea, built from plain codegen'd bit arithmetic —
  * no custom expression needed).
  *
  * The key is a pure per-row projection: zero shuffle on its own; the
  * one range shuffle happens in the shard plan that sorts by it.
  */
object ZOrder {

  /** Interleave the low `bits` of two NON-NEGATIVE integer columns:
    * `a`'s bit i lands at position 2i, `b`'s at 2i+1 (so `a` is the
    * finer-grained dimension). Higher bits are ignored — callers map
    * each dimension into `[0, 2^bits)` first (`pmod`, quantized
    * buckets, …); negative inputs would interleave sign bits into
    * garbage, hence the contract. `2·bits ≤ 62` keeps the key in a
    * BIGINT.
    *
    * The whole expression is a literal-unrolled chain of
    * shift/and/or taps — branch-free, whole-stage-codegen friendly,
    * and portable to any engine with integer bit ops (the oracle
    * replays it in SQL).
    */
  def zKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && 2 * bits <= 62, s"bits=$bits out of range (1..31)")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The matching SQL spelling of [[zKey]] for oracle replay — the
    * same unrolled tap chain over column names `a` and `b`.
    */
  def zKeySql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Zone-map pruning forecast: how many of `files` equal-row chunks a
    * two-predicate box scan must READ when rows are laid out by (a) the
    * single-key linear sort `(a, b)` and (b) the interleaved [[zKey]]
    * order — the measurement that justifies (or rejects) an OPTIMIZE
    * ZORDER rewrite BEFORE paying for it. A chunk is "read" exactly
    * when its observed `[min, max]` ranges overlap the box on BOTH
    * dimensions — the same min/max test parquet footer zone maps give a
    * scan for free. The linear layout prunes perfectly on `a` and not
    * at all on `b`; z-order trades a little of `a`'s locality for
    * pruning on BOTH — this operator puts exact numbers on that trade
    * for a concrete box.
    *
    * Inputs must be integer-canonical and non-negative in `[0, 2^bits)`
    * ([[zKey]]'s contract — callers `pmod`/bucket first). Output one row
    * per layout: `(layout, files_total, files_read, rows_read,
    * rows_matched)`; `rows_matched` (the true predicate count) is
    * layout-invariant and rides the same aggregate, so the scan runs
    * once per layout with no extra pass.
    *
    * Scale shape: the file assignment is the exact `ntile` of the
    * global `(key, a, b)` order — one bounded sort window at or below
    * [[HistTileThreshold]] rows, `Stats.ntileHist`'s histogram ranks
    * (per-value counts + distributed prefix-sum, no corpus-global sort
    * window) above it; the two are bit-identical, so the switch is
    * cost-only. The production spelling of the SAME decision is
    * `repartitionByRange(files, key)` + real footer stats, which this
    * forecast predicts. Everything downstream of the tile is one
    * ≤`files`-key aggregate per layout.
    */
  def skippingStats(
      df: org.apache.spark.sql.DataFrame,
      aCol: Column,
      bCol: Column,
      bits: Int,
      files: Int,
      aLo: Long, aHi: Long,
      bLo: Long, bHi: Long
  ): org.apache.spark.sql.DataFrame = {
    require(files > 0, "files must be positive")
    val base = df.select(aCol.cast("long").as("a"), bCol.cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    skippingForecast(Seq(
      // linear = the one-key sort a then b, packed into a single long so
      // both layouts share the ntile spelling
      ("linear", base.withColumn("__k", (col("a") * (1L << bits)) + col("b"))),
      ("zorder", base.withColumn("__k", zKey(col("a"), col("b"), bits)))),
      files, aLo, aHi, bLo, bHi)
  }

  /** Row count at or below which [[skippingForecast]] tiles with one
    * bounded sort window instead of `Stats.ntileHist`'s distributed
    * histogram ranks — the two produce bit-identical tiles
    * (`ZOrderSpec`), so this is a pure cost threshold, the same
    * adaptive shape as Spark's broadcast-join threshold. 2M rows of
    * (key, a, b) is ~50 MB through one reducer — comfortably cheap;
    * past it the single partition becomes the wall and the histogram
    * path wins.
    */
  val HistTileThreshold: Long = 2000000L

  /** The tiling + zone-map + summary machinery behind [[skippingStats]],
    * exposed for ADDITIONAL layout keys (e.g. [[withHilbertKey]], whose
    * rotation state cannot be a single column expression): each layout
    * is `(name, frame)` with columns `a`, `b` and the sort key `__k`.
    * CONTRACT: every layout holds the SAME rows under a different sort
    * key (that is what a layout bake-off means), so ONE count decides
    * the tile path for all of them — per-layout counts were pure
    * overhead (a full materialize-and-count job per extra layout,
    * measured ~⅓ of q202's runtime).
    */
  def skippingForecast(
      layouts: Seq[(String, org.apache.spark.sql.DataFrame)],
      files: Int,
      aLo: Long, aHi: Long,
      bLo: Long, bHi: Long,
      histTileThreshold: Long = HistTileThreshold
  ): org.apache.spark.sql.DataFrame = {
    require(files > 0, "files must be positive")
    // exact ntile over (__k, a, b), ADAPTIVE (the broadcast-threshold
    // shape): at or below histTileThreshold rows the tile is one sort
    // window — a bounded single-reducer sort is cheaper than five
    // distributed stages (measured 8–10× on the sf0.1 bench) — and
    // above it Stats.ntileHist's histogram ranks take over with
    // BIT-IDENTICAL output (ZOrderSpec pins the two paths equal), so
    // the choice is pure physics, never semantics. Ties in __k order
    // by the (a, b) struct, the same lexicographic order either way.
    // The lineage cut before the HISTOGRAM tile is LOAD-BEARING twice
    // over: ntileHist consumes the frame repeatedly, and
    // withHilbertKey's chained per-bit projections EXPLODE
    // exponentially if project collapse inlines them into those
    // consumers (measured: optimizer OOM on q202 without the cut).
    // The WINDOW tile path is one linear consumer chain — window →
    // per-file aggregate — so below the threshold no cut (and no
    // materialize-and-count job per layout) is paid at all; the one
    // decision count runs on the head layout's bare projection.
    val sels = layouts.map { case (name, frame) =>
      (name, frame.select(col("__k"), col("a"), col("b")))
    }
    val nRows = sels.head._2.count()
    sels.map { case (name, sel) =>
      val tiled =
        if (nRows <= histTileThreshold)
          sel.withColumn("f",
            ntile(files).over(
              org.apache.spark.sql.expressions.Window
                .orderBy(col("__k"), col("a"), col("b"))))
        else Stats.ntileHist(sel.localCheckpoint(false), files, col("__k"),
          struct(col("a"), col("b")), "f")
      val perFile = tiled.groupBy("f").agg(
        count(lit(1)).as("n"),
        min(col("a")).as("mina"), max(col("a")).as("maxa"),
        min(col("b")).as("minb"), max(col("b")).as("maxb"),
        sum(when(col("a").between(aLo, aHi) && col("b").between(bLo, bHi), 1L)
          .otherwise(0L)).as("n_match"))
      val read = col("maxa") >= aLo && col("mina") <= aHi &&
        col("maxb") >= bLo && col("minb") <= bHi
      perFile.agg(
          count(lit(1)).as("files_total"),
          sum(when(read, 1L).otherwise(0L)).as("files_read"),
          sum(when(read, col("n")).otherwise(0L)).as("rows_read"),
          sum(col("n_match")).as("rows_matched"))
        .select(lit(name).as("layout"), col("files_total"), col("files_read"),
          col("rows_read"), col("rows_matched"))
    }.reduce(_ unionByName _)
  }

  /** Hilbert curve index of `(a, b)` on the `2^bits × 2^bits` grid —
    * the space-filling curve with STRICTLY better locality than
    * [[zKey]]: consecutive indices are always grid-adjacent (unit
    * steps, no Morton jumps), so equal-index ranges cover tighter
    * (a, b) rectangles and zone maps prune better on box queries
    * ([[skippingForecast]] measures it, `q202`). Classic per-bit
    * algorithm (quadrant digit + reflect/swap rotation): the rotation
    * makes the state data-dependent, so the key is built as a chain of
    * NAMED per-iteration columns (`bits` narrow projections — Catalyst
    * keeps them separate because each step's coordinates are referenced
    * several times, and codegen fuses the chain) rather than one
    * exponentially-duplicated expression tree. Same input contract as
    * [[zKey]]: non-negative, below `2^bits`, caller maps the domain.
    * Appends `out` (BIGINT in `[0, 4^bits)`) and leaves every other
    * column untouched.
    */
  def withHilbertKey(
      df: org.apache.spark.sql.DataFrame,
      aCol: Column,
      bCol: Column,
      bits: Int,
      out: String
  ): org.apache.spark.sql.DataFrame = {
    require(bits >= 1 && 2 * bits <= 62, s"bits=$bits out of range (1..31)")
    val n = 1L << bits
    var cur = df
      .withColumn("__hx", aCol.cast("long"))
      .withColumn("__hy", bCol.cast("long"))
      .withColumn("__hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val rx = shiftright(col("__hx"), i).bitwiseAND(lit(1L))
      val ry = shiftright(col("__hy"), i).bitwiseAND(lit(1L))
      cur = cur
        .withColumn("__rx", rx)
        .withColumn("__ry", ry)
        .withColumn("__hd", col("__hd") +
          lit(1L << (2 * i)) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        // rot: ry=0 reflects (rx=1) then swaps; bits above i are already
        // consumed, so the full-width n−1−· reflection is harmless (the
        // classic formulation)
        .withColumn("__nx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n - 1) - col("__hy")).otherwise(col("__hy")))
            .otherwise(col("__hx")))
        .withColumn("__ny",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n - 1) - col("__hx")).otherwise(col("__hx")))
            .otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
        .drop("__nx", "__ny", "__rx", "__ry")
    }
    cur.withColumn(out, col("__hd")).drop("__hx", "__hy", "__hd")
  }

  /** One Hilbert iteration as SQL over columns `hx`, `hy`, `hd` — the
    * oracle's spelling of [[withHilbertKey]]'s step `i`, emitted as the
    * select list of a chained CTE (new values reference the PREVIOUS
    * step's columns, exactly like the column chain).
    */
  def hilbertStepSql(i: Int, bits: Int): String = {
    val n = 1L << bits
    val rx = s"((hx >> $i) & 1)"
    val ry = s"((hy >> $i) & 1)"
    Seq(
      s"CASE WHEN $ry = 0 THEN CASE WHEN $rx = 1 THEN ${n - 1} - hy ELSE hy END ELSE hx END AS hx",
      s"CASE WHEN $ry = 0 THEN CASE WHEN $rx = 1 THEN ${n - 1} - hx ELSE hx END ELSE hy END AS hy",
      s"hd + ${1L << (2 * i)} * xor(3 * $rx, $ry) AS hd"
    ).mkString(",\n ")
  }
}
