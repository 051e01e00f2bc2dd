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
}
