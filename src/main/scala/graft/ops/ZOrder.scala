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
    * Scale shape: the file assignment here is an `ntile` over the
    * global sort order — exact and oracle-replayable for the gate; the
    * production spelling of the SAME decision is
    * `repartitionByRange(files, key)` + real footer stats, which this
    * forecast predicts. Everything downstream of the ntile is one
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
    import org.apache.spark.sql.expressions.Window
    val base = df.select(aCol.cast("long").as("a"), bCol.cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val layouts = Seq(
      // linear = the one-key sort a then b, packed into a single long so
      // both layouts share the ntile spelling
      ("linear", (col("a") * (1L << bits)) + col("b")),
      ("zorder", zKey(col("a"), col("b"), bits)))
    layouts.map { case (name, key) =>
      val tiled = base
        .withColumn("f", ntile(files).over(Window.orderBy(key, col("a"), col("b"))))
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
}
