package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables
import graft.ops.SensorOps

/** Drained-stream ≡ batch equivalence (SURVEY.md §1.4): running Q1 as a
  * file stream over the same parquet and draining it yields exactly the
  * batch result, restricted to windows the final watermark has closed
  * (windows ending after max_ts − delay stay in state by design).
  */
class StreamBatchParitySpec extends SparkTestBase {
  import spark.implicits._

  test("Q1 streamed over events parquet (availableNow) equals batch result for closed windows") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir)

    // file source wants a directory; stage the parquet in one, and stream
    // with the RAW schema (ts as nanos long) + the same ns->us conversion
    // Tables.events applies
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stageDir = Files.createTempDirectory("graft_parity_in_")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      stageDir.resolve("events.parquet"))
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema

    val streamed = spark.readStream.schema(rawSchema)
      .parquet(stageDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "5 seconds")

    val alerts = SensorOps.alertsStreaming(streamed,
      keyCol = "user_id", valueCol = "value", tsCol = "ts",
      windowLen = "1 day", threshold = 30, minCount = 3)

    val chk = Files.createTempDirectory("graft_parity_").toString
    val query = alerts.writeStream.format("memory").queryName("parity_out")
      .option("checkpointLocation", chk)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination(120000)

    val maxTs = events.agg(max(col("ts"))).collect().head.getTimestamp(0).getTime
    val watermark = maxTs - 5000L

    val batch = SensorOps.alerts(events,
        keyCol = "user_id", valueCol = "value", tsCol = "ts",
        windowLen = "1 day", threshold = 30, minCount = 3)
      .filter(unix_timestamp(col("start_event_time")) * 1000L + 86400000L <= watermark)
      .as[(Long, Long, java.sql.Timestamp)].collect().toSet

    val stream = spark.table("parity_out")
      .as[(Long, Long, java.sql.Timestamp)].collect().toSet

    assert(batch.nonEmpty, "fixture must produce closed-window alerts")
    assert(stream == batch,
      s"drained stream must equal batch on closed windows; stream=${stream.size} batch=${batch.size}")
  }
}
