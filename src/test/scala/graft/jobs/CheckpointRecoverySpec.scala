package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.core.{EngineConf, Telemetry}

/** Checkpoint recovery: the alert pipeline restarted from its checkpoint
  * resumes offsets, watermark, and window state — every alert is emitted
  * exactly once across restarts (file sink exactly-once contract,
  * SURVEY.md §2.3 streaming row).
  */
class CheckpointRecoverySpec extends SparkTestBase {
  import spark.implicits._

  test("alert stream restarted from checkpoint emits each alert exactly once") {
    val in = Files.createTempDirectory("graft_ckpt_in_")
    val out = Files.createTempDirectory("graft_ckpt_out_").toString
    val chk = Files.createTempDirectory("graft_ckpt_chk_").toString
    val schema = Seq.empty[Telemetry].toDS().schema

    def writeBatch(name: String, rows: Seq[Telemetry]): Unit =
      rows.toDS().coalesce(1).write.parquet(s"$in/$name")

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).option("latestFirst", "false")
        .parquet(s"$in/*/")
      val query = SensorPipeline.alertStream(stream, EngineConf.default)
        .select(col("sensor_id"), col("count_temp"),
          unix_timestamp(col("start_event_time")).as("start_sec"))
        .writeStream.format("json")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination(120000)
    }

    writeBatch("b1",
      (0 until 4).map(i => Telemetry("s1", 31, ts(s"2024-01-01 00:00:0$i"))) :+
        Telemetry("s0", 20, ts("2024-01-01 00:01:00")))
    runOnce()

    writeBatch("b2",
      (0 until 4).map(i => Telemetry("s2", 31, ts(s"2024-01-01 00:02:0$i"))) :+
        Telemetry("s0", 20, ts("2024-01-01 00:05:00")))
    runOnce() // recovers offsets + watermark + window state from chk

    writeBatch("b3", Seq(Telemetry("s0", 20, ts("2024-01-01 00:10:00"))))
    runOnce()

    val alerts = spark.read
      .schema("sensor_id STRING, count_temp LONG, start_sec LONG")
      .json(s"$out/*.json")
      .as[(String, Long, Long)].collect().toList
    // exactly once: both alerts present, no duplicates across restarts
    assert(alerts.sorted == List(
      ("s1", 4L, ts("2024-01-01 00:00:00").getTime / 1000),
      ("s2", 4L, ts("2024-01-01 00:02:00").getTime / 1000)).sorted,
      s"got $alerts")
  }
}
