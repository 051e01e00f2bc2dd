package graft.io

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Telemetry

/** S2/S3 wire-format round trip on Kafka-shaped rows (binary `value`
  * column) — no broker needed to pin the JSON/ISO-8601 contract
  * (`main.py:25-26,49-50`; producer `kfpLambdaStreamProducer.py:50-54`).
  */
class KafkaJsonSpec extends SparkTestBase {
  import spark.implicits._

  test("decode parses producer-shaped JSON incl. ISO-8601 fractional timestamps") {
    // exactly what the reference producer emits (datetime.now().isoformat())
    val wire = Seq(
      """{"sensor_id": "3", "temperature": 31, "event_time": "2026-08-12T14:03:27.123456"}""",
      """{"sensor_id": "5", "temperature": 28, "event_time": "2026-08-12T14:03:28"}""",
      """{"sensor_id": "1", "temperature": 30, "event_time": null}""")
    val kafkaShaped = wire.toDF("json")
      .select(col("json").cast("binary").as("value"))
    val out = KafkaJson.decode(kafkaShaped).as[Telemetry].collect().sortBy(_.sensor_id)
    assert(out.map(_.sensor_id).toList == List("1", "3", "5"))
    assert(out.map(_.temperature).toList == List(30L, 31L, 28L))
    assert(out(1).event_time == ts("2026-08-12 14:03:27.123456"))
    assert(out(2).event_time == ts("2026-08-12 14:03:28"))
    assert(out(0).event_time == null)
  }

  test("encode/decode round-trips alert rows") {
    val alerts = Seq(("s1", 5L, ts("2024-01-01 00:00:00"))).toDF(
      "sensor_id", "count_temp", "start_event_time")
    val encoded = KafkaJson.encode(alerts)
    assert(encoded.columns.toList == List("value"))
    val decoded = KafkaJson.decode(
      encoded.select(col("value").cast("binary").as("value")),
      graft.core.TelemetrySchema.alertSchema)
    val row = decoded.collect().head
    assert(row.getAs[String]("sensor_id") == "s1")
    assert(row.getAs[Long]("count_temp") == 5L)
    assert(row.getAs[java.sql.Timestamp]("start_event_time") == ts("2024-01-01 00:00:00"))
  }
}
