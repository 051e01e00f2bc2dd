package graft.io

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.TelemetrySchema
import graft.ops.SensorOps

/** The Kafka integration seam, end to end MINUS the broker socket
  * (S1/S3 are environmental in this sandbox — no broker, no
  * `spark-sql-kafka` jar): a stream of Kafka-SHAPED records (binary
  * `value` holding the reference producer's JSON) runs
  * decode → watermark → alerts → encode inside a real streaming query
  * with a `foreachBatch` producer stub, so every byte-level contract
  * the broker would carry (producer JSON in, sink JSON out, ISO-8601
  * timestamps both ways) is exercised — the only untested surface left
  * is the literal socket, which [[KafkaJson.source]]/[[KafkaJson.sink]]
  * delegate to the standard connector anyway.
  */
class KafkaSeamSpec extends SparkTestBase {
  import spark.implicits._

  /** In-memory stand-in for the Kafka producer: foreachBatch appends
    * each micro-batch's encoded `value` payloads here.
    */
  private val broker = new ConcurrentLinkedQueue[String]()

  test("wire-in to wire-out: decode -> watermark -> alerts -> encode over foreachBatch") {
    broker.clear()
    // the reference producer's exact JSON shape (isoformat timestamps)
    def wire(id: String, temp: Long, iso: String): String =
      s"""{"sensor_id": "$id", "temperature": $temp, "event_time": "$iso"}"""
    val mem = MemoryStream[String](spark)
    // Kafka scan shape: the broker hands the engine a binary `value`
    val kafkaShaped = mem.toDF().select(col("value").cast("binary").as("value"))
    val alerts = SensorOps.alertsStreaming(
      KafkaJson.decode(kafkaShaped, TelemetrySchema.schema)
        .withWatermark("event_time", "5 seconds"))
    val query = alerts.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the sink half of KafkaJson.sink minus format("kafka"): same
        // encode, same per-batch producer hand-off
        KafkaJson.encode(batch).collect()
          .foreach(r => broker.add(r.getString(0)))
      }
      .start()
    try {
      // four hot readings in the 00:00:00–00:00:30 window (> minCount 3),
      // one cold sensor in the same window (must not alert), and one hot
      // pair only (must not alert)
      mem.addData(Seq(
        wire("s1", 31, "2026-08-12T14:00:01"),
        wire("s1", 32, "2026-08-12T14:00:05.250000"),
        wire("s1", 33, "2026-08-12T14:00:11"),
        wire("s1", 34, "2026-08-12T14:00:21"),
        wire("cold", 10, "2026-08-12T14:00:02"),
        wire("s2", 40, "2026-08-12T14:00:03"),
        wire("s2", 41, "2026-08-12T14:00:04")))
      query.processAllAvailable()
      // advance the watermark past the window end so append emits
      mem.addData(Seq(wire("s9", 11, "2026-08-12T14:10:00")))
      query.processAllAvailable()
      mem.addData(Seq(wire("s9", 11, "2026-08-12T14:20:00")))
      query.processAllAvailable()
    } finally query.stop()

    val out = broker.toArray(Array.empty[String]).toList
    assert(out.size == 1, s"exactly one alert must reach the broker: $out")
    // the out-wire contract: decode the produced bytes with the sink
    // schema and check every field (round trip through REAL json)
    val back = KafkaJson.decode(
      out.toDF("json").select(col("json").cast("binary").as("value")),
      TelemetrySchema.alertSchema).collect().head
    assert(back.getAs[String]("sensor_id") == "s1")
    assert(back.getAs[Long]("count_temp") == 4L)
    assert(back.getAs[java.sql.Timestamp]("start_event_time") ==
      ts("2026-08-12 14:00:00"))
    // and the raw wire is the reference sink's JSON shape (ISO-8601)
    assert(out.head.contains(""""sensor_id":"s1""""), out.head)
    assert(out.head.contains(""""count_temp":4"""), out.head)
    assert(out.head.contains("2026-08-12T14:00:00"), out.head)
  }

  test("source/sink builders accept and carry the reference's security options") {
    // construction-only (no broker): the option surface the reference
    // passes through (main.py:21-24,28-31) must not throw at build time
    val reader = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", "broker:9098")
      .option("subscribe", "sensors")
      .option("startingOffsets", "earliest")
      .option("kafka.group.id", "testGroup")
      .option("kafka.security.protocol", "SASL_SSL")
      .option("kafka.sasl.mechanism", "AWS_MSK_IAM")
    assert(reader != null)
    val mem = MemoryStream[(String, Long, java.sql.Timestamp)](spark)
    val writer = KafkaJson.sink(
      mem.toDF().toDF("sensor_id", "count_temp", "start_event_time"),
      bootstrapServers = "broker:9098", topic = "alerts",
      checkpointDir = "/tmp/never-started",
      extraOptions = Map("kafka.security.protocol" -> "SASL_SSL"))
    assert(writer != null) // start() would need the connector jar + broker
  }
}
