package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Sensor telemetry record — the reference's input row type.
  *
  * Mirrors the Flink DDL `create_table_input`
  * (reference `PythonKafkaSink/main.py:14-18`): `sensor_id VARCHAR(64) NOT
  * NULL`, `temperature BIGINT NOT NULL`, `event_time TIMESTAMP(3)` nullable
  * (rows with NULL event_time fall out of event-time windows in both
  * engines).
  */
case class Telemetry(sensor_id: String, temperature: Long, event_time: Timestamp)

/** Alert output row (Kafka sink schema, reference `main.py:40-42`). */
case class Alert(sensor_id: String, count_temp: Long, start_event_time: Timestamp)

/** Windowed-average output row before partition columns are appended
  * (S3 sink schema, reference `main.py:61-67`).
  */
case class AvgTemp(sensor_id: String, avg_temp: Long, start_event_time: Timestamp)

object TelemetrySchema {
  /** Spark schema of the JSON wire record (`main.py:14-18`). */
  val schema: StructType = StructType(Seq(
    StructField("sensor_id", StringType, nullable = false),
    StructField("temperature", LongType, nullable = false),
    StructField("event_time", TimestampType, nullable = true)
  ))

  /** ISO-8601, matching `'json.timestamp-format.standard' = 'ISO-8601'`
    * (`main.py:26,50`) and the producer's `datetime.now().isoformat()`
    * (`kfpLambdaStreamProducer.py:53`).
    */
  val timestampFormat = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]"

  val alertSchema: StructType = StructType(Seq(
    StructField("sensor_id", StringType, nullable = false),
    StructField("count_temp", LongType, nullable = false),
    StructField("start_event_time", TimestampType, nullable = true)
  ))

  /** S3 sink schema incl. the four BIGINT partition columns
    * (`main.py:61-67`, `PARTITIONED BY` at `:69`).
    */
  val avgSchema: StructType = StructType(Seq(
    StructField("sensor_id", StringType, nullable = false),
    StructField("avg_temp", LongType, nullable = false),
    StructField("start_event_time", TimestampType, nullable = true),
    StructField("year", LongType, nullable = true),
    StructField("month", LongType, nullable = true),
    StructField("day", LongType, nullable = true),
    StructField("hour", LongType, nullable = true)
  ))
}
