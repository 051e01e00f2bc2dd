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

  /** Flink's `AVG(BIGINT)` returns BIGINT — integer division with the
    * quotient truncated toward zero (reference sink column `avg_temp
    * BIGINT NOT NULL`, `main.py:62,94`). Spark's `avg` returns DOUBLE, so
    * the engine reproduces the reference semantics exactly as
    * `sum DIV count` — Spark's `DIV` (IntegralDivide) truncates toward
    * zero like Java/Flink long division, for negative sums too
    * (sum=-11,count=2 → -5, where floor-division would give -6).
    *
    * Non-BIGINT inputs are first quantized with `floor()` (not a plain
    * long cast, which truncates toward zero): the DuckDB oracle applies
    * `floor(value)`, and the two differ on negative fractional inputs
    * (floor(-0.5) = -1 vs cast -0). The reference itself only ever feeds
    * BIGINT temperatures, where floor is the identity.
    */
  def truncatedAvg(valueCol: String): Column =
    expr(s"CAST(sum(CAST(floor(`$valueCol`) AS BIGINT)) DIV count(1) AS BIGINT)")

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

  /** R13 — the consumer Lambda's per-alert message template, verbatim
    * (`kfpLambdaConsumerSNS.py:18`):
    * `"Sensor Id: {sensor_id} has exceeded the set threshold at the window start time: {start_event_time}"`.
    *
    * The Lambda interpolates `start_event_time` as it appears in the Kafka
    * JSON record, which Flink's sink serializes ISO-8601
    * (`'json.timestamp-format.standard'='ISO-8601'`, `main.py:50`) — and
    * window starts are whole seconds, so the fractional part never prints:
    * `2024-01-01T00:00:30`. [[alertMessage]] renders the same string from
    * a timestamp column via `date_format` (session timezone is UTC).
    */
  def alertMessage(start: Column, keyCol: String = "sensor_id"): Column =
    concat(
      lit("Sensor Id: "), col(keyCol).cast("string"),
      lit(" has exceeded the set threshold at the window start time: "),
      date_format(start, "yyyy-MM-dd'T'HH:mm:ss"))

  def alertMessage(): Column = alertMessage(col("start_event_time"))
}
