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
