package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's two continuous queries (Q1 alert, Q2 windowed average),
  * decomposed into composable DataFrame→DataFrame operators (SURVEY.md §2.2
  * R1–R13). The same functions serve batch (verify/bench over parquet) and
  * streaming (with `withWatermark` applied upstream by the pipeline) — the
  * Catalyst plans are identical modulo the watermark node.
  *
  * Column names are parameters so the ops run both on reference-shaped
  * telemetry (`sensor_id`/`temperature`/`event_time`) and on the driver's
  * `events` table (`user_id`/`value`/`ts`).
  */
object SensorOps {

  /** R1 — pre-aggregation filter `WHERE temperature > 30`
    * (reference `PythonKafkaSink/main.py:84`).
    */
  def hotFilter(df: DataFrame, valueCol: String, threshold: Double): DataFrame =
    df.filter(col(valueCol) > threshold)

  /** Q1 — high-temperature alert (reference `main.py:79-86`):
    *
    * {{{
    * SELECT sensor_id, count(*), TUMBLE_START(event_time, INTERVAL '30' SECOND)
    * FROM input WHERE temperature > 30
    * GROUP BY TUMBLE(event_time, INTERVAL '30' SECOND), sensor_id
    * HAVING count(*) > 3
    * }}}
    *
    * R1 filter → R2 tumble → R4 count → R7 having (strict `>`) → R6/R8
    * window-start projection. Single shuffle on (window, key); partial
    * aggregation (map-side combine) is automatic via HashAggregateExec —
    * the plan scales linearly with input at any key cardinality.
    */
  def alerts(
      df: DataFrame,
      keyCol: String = "sensor_id",
      valueCol: String = "temperature",
      tsCol: String = "event_time",
      windowLen: String = "30 seconds",
      threshold: Double = 30,
      minCount: Long = 3
  ): DataFrame =
    hotFilter(df, valueCol, threshold)
      .groupBy(Windows.tumble(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("count_temp"))
      .filter(col("count_temp") > minCount)
      .select(
        col(keyCol),
        col("count_temp"),
        col("window.start").as("start_event_time"))

  /** Streaming-safe Q1. The batch [[alerts]] filters before aggregating —
    * optimal for scans, but in a stream Catalyst pushes that filter BELOW
    * the `EventTimeWatermark` node (the predicate doesn't reference the
    * watermark column), so records failing `temperature > 30` would never
    * advance the watermark. Flink assigns watermarks at the source, before
    * any WHERE (`main.py:18`), so a quiet-but-cold sensor still closes
    * windows. This variant keeps every record flowing through the watermark
    * and counts hot rows conditionally — output contents identical to the
    * reference, watermark driven by all records. Cost: per-(window,key)
    * state exists for cold-only groups too; the HAVING drops them at emit.
    */
  def alertsStreaming(
      watermarked: DataFrame,
      keyCol: String = "sensor_id",
      valueCol: String = "temperature",
      tsCol: String = "event_time",
      windowLen: String = "30 seconds",
      threshold: Double = 30,
      minCount: Long = 3
  ): DataFrame =
    watermarked
      .groupBy(Windows.tumble(col(tsCol), windowLen), col(keyCol))
      .agg(count(when(col(valueCol) > threshold, 1)).as("count_temp"))
      .filter(col("count_temp") > minCount)
      .select(
        col(keyCol),
        col("count_temp"),
        col("window.start").as("start_event_time"))

  /** Flink's `AVG(BIGINT)` returns BIGINT — integer division truncated
    * toward zero (reference sink column `avg_temp BIGINT NOT NULL`,
    * `main.py:62,94`). Spark's `avg` returns DOUBLE, so the engine
    * reproduces the reference semantics as floor(sum/count), equal to
    * truncation for the non-negative inputs the generator produces
    * (SURVEY.md §7.4 item 1).
    */
  def truncatedAvg(valueCol: String): Column =
    floor(sum(col(valueCol).cast("long")) / count(lit(1))).cast("long")

  /** Q2 inner query — per-window truncated average (reference
    * `main.py:93-96`). R3 tumble(60 s) → R5 avg → R6/R8 projection.
    */
  def windowedAvg(
      df: DataFrame,
      keyCol: String = "sensor_id",
      valueCol: String = "temperature",
      tsCol: String = "event_time",
      windowLen: String = "60 seconds"
  ): DataFrame =
    df.groupBy(Windows.tumble(col(tsCol), windowLen), col(keyCol))
      .agg(truncatedAvg(valueCol).as("avg_temp"))
      .select(
        col(keyCol),
        col("avg_temp"),
        col("window.start").as("start_event_time"))

  /** Q2 outer query — R9 star-expansion + R11 date-part partition columns
    * (reference `main.py:91-92`). Spark's `year()` etc. return INT; the
    * sink declares BIGINT (`main.py:64-67`) → explicit casts
    * (SURVEY.md §7.4 item 6).
    */
  def withDateParts(df: DataFrame, tsCol: String = "start_event_time"): DataFrame =
    df.select(
      col("*"),
      year(col(tsCol)).cast("long").as("year"),
      month(col(tsCol)).cast("long").as("month"),
      dayofmonth(col(tsCol)).cast("long").as("day"),
      hour(col(tsCol)).cast("long").as("hour"))

  /** Q2 end-to-end (reference `main.py:90-96`). */
  def avgWithPartitions(
      df: DataFrame,
      keyCol: String = "sensor_id",
      valueCol: String = "temperature",
      tsCol: String = "event_time",
      windowLen: String = "60 seconds"
  ): DataFrame =
    withDateParts(windowedAvg(df, keyCol, valueCol, tsCol, windowLen))

  /** R13 — the consumer Lambda's per-alert message template
    * (`kfpLambdaConsumerSNS.py:17-18`):
    * `"Sensor Id: {sensor_id} has exceeded the temperature threshold {count_temp} times"`.
    */
  def alertMessage(keyCol: String = "sensor_id", countCol: String = "count_temp"): Column =
    concat(
      lit("Sensor Id: "), col(keyCol).cast("string"),
      lit(" has exceeded the temperature threshold "),
      col(countCol).cast("string"), lit(" times"))
}
