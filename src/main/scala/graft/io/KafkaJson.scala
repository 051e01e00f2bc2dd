package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

import graft.core.TelemetrySchema

/** Kafka JSON source/sink — S1+S2 / S3 in SURVEY.md §2.1.
  *
  * Source mirrors the reference DDL `create_table_input`
  * (`PythonKafkaSink/main.py:13-32`): earliest offsets, consumer group,
  * JSON value with ISO-8601 timestamps, security options passed through.
  * Sink mirrors `create_table_output_kafka` (`main.py:38-56`): JSON-encoded
  * value, at-least-once (Spark's Kafka sink default, same contract as the
  * Flink 1.13 SQL connector — SURVEY.md §7.4 item 7).
  *
  * Deployment note: `format("kafka")` resolves lazily at `load()`/query
  * start and requires the standard `spark-sql-kafka-0-10` connector
  * artifact on the classpath (shipped with every Spark distribution's
  * Kafka integration; NOT present in this test container, which has no
  * broker either — hence the streaming tests exercise the decode/encode
  * halves over MemoryStream, and source/sink construction, only).
  */
object KafkaJson {

  /** Streaming Kafka scan + JSON decode → typed telemetry rows.
    *
    * @param extraOptions pass-through for `kafka.security.protocol`,
    *   `kafka.sasl.*` etc. (`main.py:21-24,28-31`) — the engine does not
    *   interpret them.
    */
  def source(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      schema: StructType = TelemetrySchema.schema,
      startingOffsets: String = "earliest",  // main.py:27
      groupId: String = "testGroup",         // main.py:28
      extraOptions: Map[String, String] = Map.empty
  ): DataFrame = {
    val reader = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("kafka.group.id", groupId)
    extraOptions.foreach { case (k, v) => reader.option(k, v) }
    decode(reader.load(), schema)
  }

  /** S2 — JSON decode (`'format'='json'`, ISO-8601: `main.py:25-26`). */
  def decode(kafkaDf: DataFrame, schema: StructType = TelemetrySchema.schema): DataFrame =
    kafkaDf
      .select(from_json(
        col("value").cast("string"), schema,
        Map("timestampFormat" -> TelemetrySchema.timestampFormat)).as("r"))
      .select(col("r.*"))

  /** JSON encode of all columns into a Kafka `value` (`main.py:49-50`). */
  def encode(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toSeq: _*),
      Map("timestampFormat" -> TelemetrySchema.timestampFormat)).as("value"))

  /** S3 — Kafka JSON sink writer (start() left to the caller). */
  def sink(
      df: DataFrame,
      bootstrapServers: String,
      topic: String,
      checkpointDir: String,
      extraOptions: Map[String, String] = Map.empty
  ): DataStreamWriter[Row] = {
    val writer = encode(df).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    extraOptions.foreach { case (k, v) => writer.option(k, v) }
    writer
  }
}
