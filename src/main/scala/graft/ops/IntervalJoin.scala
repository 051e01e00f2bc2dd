package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned (bucketed) range joins — the SCALE path for non-equi interval
  * predicates.
  *
  * A pure range join (`point BETWEEN start AND end`, or interval
  * overlap, with NO equi key) has no hashable join key, so Catalyst can
  * only plan a broadcast nested-loop or cartesian product — O(|L|·|R|)
  * comparisons, a non-starter when neither side is broadcast-sized.
  * q29's interval join survives because it ALSO carries a user-id equi
  * key; these operators cover the keyless case.
  *
  * The standard fix (the same idea behind Databricks' range-join
  * optimization and spatial grid joins): quantize the time axis into
  * fixed `binSeconds` bins, explode each interval to the bins it covers,
  * and equi-join on the bin id — turning the nested loop into a plain
  * shuffled hash/sort-merge join with an exact residual filter. Cost is
  * O(|L| + Σ span/bin) shuffled rows: `binSeconds` should sit near the
  * TYPICAL interval span (bigger bins → fewer copies but more false
  * candidates filtered post-join; smaller bins → the reverse).
  *
  * Duplicate elimination is ARITHMETIC, not a distinct: a (left, right)
  * pair would match once per shared bin, so matches are kept only in the
  * single canonical bin containing `greatest(startL, startR)` (for a
  * point, the point itself). No dedup shuffle, no aggregate — the join
  * output is exact as produced.
  *
  * Times are epoch seconds as BIGINT and intervals are half-open
  * `[start, end)`; callers must pre-floor timestamps (`unix_timestamp`).
  * Bin ids use `DIV`, which truncates toward zero — exact flooring for
  * the non-negative epochs this engine works in (pre-1970 data would
  * need a floor-div spelling).
  *
  * Not in the reference (no joins at all — SURVEY.md §2.3); this is
  * infrastructure the capability checklist's interval-join row needs to
  * survive 100 TB without an equi key.
  */
object IntervalJoin {

  /** Join each point row to every interval row whose half-open
    * `[startSec, endSec)` contains `pointSec`. Output schema: all point
    * columns then all interval columns (inner join). Column names must
    * be disjoint between the two inputs.
    *
    * A point lives in exactly one bin, so no canonical-bin filter is
    * needed: each (point, interval) match is produced exactly once, by
    * the interval copy in the point's bin.
    */
  def binnedPointJoin(
      points: DataFrame,
      pointSec: String,
      intervals: DataFrame,
      startSec: String,
      endSec: String,
      binSeconds: Long
  ): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val binned = intervals
      .filter(col(endSec) > col(startSec))
      .withColumn("__bin",
        explode(sequence(
          expr(s"$startSec DIV $binSeconds"),
          expr(s"($endSec - 1) DIV $binSeconds"))))
    points
      .withColumn("__bin", expr(s"$pointSec DIV $binSeconds"))
      .join(binned, Seq("__bin"))
      .filter(col(pointSec) >= col(startSec) && col(pointSec) < col(endSec))
      .drop("__bin")
  }

  /** Join interval rows from `left` and `right` that OVERLAP:
    * `startL < endR && startR < endL` (half-open semantics — touching
    * endpoints do not overlap). Each matching pair is emitted exactly
    * once via the canonical-bin filter (`greatest(startL, startR)`'s
    * bin), not a distinct. Column names must be disjoint.
    */
  def binnedOverlapJoin(
      left: DataFrame,
      leftStart: String,
      leftEnd: String,
      right: DataFrame,
      rightStart: String,
      rightEnd: String,
      binSeconds: Long
  ): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    def binned(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(e) > col(s))
      .withColumn("__bin",
        explode(sequence(
          expr(s"$s DIV $binSeconds"),
          expr(s"($e - 1) DIV $binSeconds"))))
    binned(left, leftStart, leftEnd)
      .join(binned(right, rightStart, rightEnd), Seq("__bin"))
      .filter(col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd))
      .filter(col("__bin") ===
        expr(s"greatest($leftStart, $rightStart) DIV $binSeconds"))
      .drop("__bin")
  }
}
