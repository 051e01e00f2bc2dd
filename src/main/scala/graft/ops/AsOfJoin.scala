package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — attach to each left row the latest right row
  * with `rightTime <= leftTime` for the same key.
  *
  * Not in the reference (it has no joins at all, SURVEY.md §2.3) and not a
  * Spark built-in; this is the classic scalable formulation: tag both
  * inputs, union them, and take a running `last(right, ignoreNulls)` over
  * a (key)-partitioned window ordered by (time, side). ONE shuffle on the
  * key, no range cross-product, no per-row probing — linear at any scale
  * and skew-bounded by the key distribution like any windowed op.
  *
  * Contract: the right side must be unique per (key, time) — pre-aggregate
  * otherwise (ties would be nondeterministic). Right rows sort before left
  * rows on equal timestamps, so `<=` semantics hold.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      asOfCol: String = "asof"
  ): DataFrame = {
    val lStruct = struct(left.columns.map(left(_)).toSeq: _*)
    val rStruct = struct(right.columns.map(right(_)).toSeq: _*)

    val r = right.select(
      right(rightKey).as("__key"), right(rightTime).as("__time"),
      lit(0).as("__side"), rStruct.as("__r"), lit(null).cast(structType(left)).as("__l"))
    val l = left.select(
      left(leftKey).as("__key"), left(leftTime).as("__time"),
      lit(1).as("__side"), lit(null).cast(structType(right)).as("__r"), lStruct.as("__l"))

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__time"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn(asOfCol, last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col(asOfCol))
  }

  /** As-of FORWARD join — the earliest right row with
    * `rightTime >= leftTime` per key (pandas `merge_asof
    * direction='forward'`). Same tagged-union single-shuffle shape as
    * [[backward]], mirrored: LEFT rows sort before right rows on equal
    * timestamps so the `>=` (inclusive) semantics hold, and the window
    * runs current-row → following with `first(..., ignoreNulls)`.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      asOfCol: String = "asof"
  ): DataFrame = {
    val lStruct = struct(left.columns.map(left(_)).toSeq: _*)
    val rStruct = struct(right.columns.map(right(_)).toSeq: _*)

    val r = right.select(
      right(rightKey).as("__key"), right(rightTime).as("__time"),
      lit(1).as("__side"), rStruct.as("__r"), lit(null).cast(structType(left)).as("__l"))
    val l = left.select(
      left(leftKey).as("__key"), left(leftTime).as("__time"),
      lit(0).as("__side"), lit(null).cast(structType(right)).as("__r"), lStruct.as("__l"))

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__time"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    r.unionByName(l)
      .withColumn(asOfCol, first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(col("__l.*"), col(asOfCol))
  }

  /** As-of NEAREST join — whichever of the backward/forward matches is
    * closer in time, ties to the backward one (pandas `merge_asof
    * direction='nearest'`). ONE shuffle and ONE sort: both directional
    * candidates come from the same (key)-partitioned ordering, as a
    * `last` over the preceding frame and a `first` over the following
    * frame. Right rows sort BEFORE left on equal timestamps, so an
    * equal-timestamp right row is captured by the backward frame with
    * delta 0 — which wins every comparison — keeping the inclusive
    * semantics without a second sort order.
    *
    * Contract: both time columns must be TIMESTAMP (deltas compare via
    * `unix_micros`).
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      asOfCol: String = "asof"
  ): DataFrame = {
    val lStruct = struct(left.columns.map(left(_)).toSeq: _*)
    val rStruct = struct(right.columns.map(right(_)).toSeq: _*)

    val r = right.select(
      right(rightKey).as("__key"), right(rightTime).as("__time"),
      lit(0).as("__side"), rStruct.as("__r"), lit(null).cast(structType(left)).as("__l"))
    val l = left.select(
      left(leftKey).as("__key"), left(leftTime).as("__time"),
      lit(1).as("__side"), lit(null).cast(structType(right)).as("__r"), lStruct.as("__l"))

    val ord = Window.partitionBy(col("__key")).orderBy(col("__time"), col("__side"))
    val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val bT = unix_micros(col("__b").getField(rightTime))
    val fT = unix_micros(col("__f").getField(rightTime))
    val tT = unix_micros(col("__time"))
    r.unionByName(l)
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__r"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
      .withColumn(asOfCol,
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(tT - bT <= fT - tT, col("__b"))
          .otherwise(col("__f")))
      .select(col("__l.*"), col(asOfCol))
  }

  private def structType(df: DataFrame): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(df.schema.fields)

  /** Convenience projection: as-of join then pull one right-side column. */
  def backwardSelect(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      pick: String
  ): DataFrame =
    backward(left, right, leftKey, rightKey, leftTime, rightTime)
      .withColumn(pick, col(s"asof.$pick"))
      .drop("asof")
}
