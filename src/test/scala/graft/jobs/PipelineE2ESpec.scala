package graft.jobs

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.core.{EngineConf, Telemetry}
import graft.io.{AlertDispatch, CollectingAlertSink, PartitionedJsonSink}

/** End-to-end: telemetry → Q2 → partitioned JSON file sink (S4 layout:
  * `year=/month=/day=/hour=` dirs, `main.py:69`), and Q1 → per-record
  * alert dispatch (S7, `kfpLambdaConsumerSNS.py:12-23`).
  */
class PipelineE2ESpec extends SparkTestBase {
  import spark.implicits._

  private val conf = EngineConf.default

  test("Q2 streaming writes Hive-partitioned JSON files") {
    val outDir = Files.createTempDirectory("graft_s4_").toString
    val chkDir = Files.createTempDirectory("graft_chk_").toString
    val mem = MemoryStream[Telemetry](spark)
    val query = PartitionedJsonSink.writer(
      SensorPipeline.avgStream(mem.toDF(), conf), outDir, chkDir).start()
    try {
      mem.addData(Seq(
        Telemetry("s1", 31, ts("2024-03-05 17:00:01")),
        Telemetry("s1", 32, ts("2024-03-05 17:00:02"))))
      query.processAllAvailable()
      mem.addData(Seq(Telemetry("s2", 20, ts("2024-03-05 17:05:00"))))
      query.processAllAvailable()
    } finally query.stop()

    val partDir = Paths.get(outDir, "year=2024", "month=3", "day=5", "hour=17")
    assert(Files.isDirectory(partDir), s"expected Hive-style partition dirs under $outDir")
    val rows = spark.read.schema("sensor_id STRING, avg_temp LONG, start_event_time TIMESTAMP")
      .json(s"$outDir/year=*/month=*/day=*/hour=*/*.json")
      .select("sensor_id", "avg_temp").as[(String, Long)].collect().toList
    assert(rows == List(("s1", 31L)))
  }

  test("Q1 alerts fan out one message per record through the AlertSink") {
    CollectingAlertSink.drain()
    val mem = MemoryStream[Telemetry](spark)
    val query = AlertDispatch.messages(SensorPipeline.alertStream(mem.toDF(), conf))
      .writeStream
      .foreach(AlertDispatch.writer(new CollectingAlertSink))
      .outputMode("append")
      .start()
    try {
      mem.addData((0 until 4).map(i => Telemetry("s9", 31, ts(s"2024-01-01 00:00:0$i"))))
      query.processAllAvailable()
      mem.addData(Seq(Telemetry("s2", 20, ts("2024-01-01 00:05:00"))))
      query.processAllAvailable()
      mem.addData(Seq(Telemetry("s2", 20, ts("2024-01-01 00:10:00"))))
      query.processAllAvailable()
    } finally query.stop()

    val sent = CollectingAlertSink.drain()
    assert(sent == List(
      ("The sensor reading has exceeded the threshold",
        "Sensor Id: s9 has exceeded the set threshold at the window start time: 2024-01-01T00:00:00")))
  }

  test("shared-scan batch fan-out writes partitioned files with _SUCCESS markers") {
    val outDir = Files.createTempDirectory("graft_s4b_").toString
    val batch = Seq(
      Telemetry("s1", 31, ts("2024-03-05 17:00:01")),
      Telemetry("s1", 33, ts("2024-03-05 17:00:02"))).toDF()
    val avgs = graft.ops.SensorOps.avgWithPartitions(batch)
    PartitionedJsonSink.writeBatchWithSuccessMarkers(avgs, outDir)
    val partDir = Paths.get(outDir, "year=2024", "month=3", "day=5", "hour=17")
    assert(Files.isDirectory(partDir))
    assert(Files.exists(partDir.resolve("_SUCCESS")),
      "reference partition-commit success-file policy (main.py:74-75)")
    val files = Files.list(partDir).iterator().asScala.map(_.getFileName.toString).toList
    assert(files.exists(_.endsWith(".json")))
  }

  test("delayed partition commit: _SUCCESS lands only once the watermark clears hour end + delay") {
    val outDir = Files.createTempDirectory("graft_s4d_").toString
    val batch = Seq(
      Telemetry("s1", 31, ts("2024-03-05 16:10:00")),
      Telemetry("s1", 33, ts("2024-03-05 17:00:02"))).toDF()
    val avgs = graft.ops.SensorOps.avgWithPartitions(batch)
    // watermark 17:05 with 1-min delay: hour 16 (ends 17:00) is closed,
    // hour 17 (ends 18:00) is still open
    PartitionedJsonSink.writeBatchWithDelayedMarkers(
      avgs, outDir, ts("2024-03-05 17:05:00"), delayMinutes = 1L)
    val h16 = Paths.get(outDir, "year=2024", "month=3", "day=5", "hour=16")
    val h17 = Paths.get(outDir, "year=2024", "month=3", "day=5", "hour=17")
    assert(Files.isDirectory(h16) && Files.isDirectory(h17), "rows append immediately")
    assert(Files.exists(h16.resolve("_SUCCESS")),
      "closed partition must commit (main.py:74-75 delay semantics)")
    assert(!Files.exists(h17.resolve("_SUCCESS")),
      "open partition must stay uncommitted until the watermark clears it")
    // watermark progress alone (no new rows for that dir) commits the rest:
    // 18:00 end + 1 min delay <= 18:01
    val n = PartitionedJsonSink.commitClosedPartitions(
      outDir, ts("2024-03-05 18:01:00"), delayMinutes = 1L)
    assert(n == 1 && Files.exists(h17.resolve("_SUCCESS")))
    // idempotent: nothing left to commit
    assert(PartitionedJsonSink.commitClosedPartitions(
      outDir, ts("2024-03-05 19:00:00"), delayMinutes = 1L) == 0)
  }

  test("marker pass skips unparseable and out-of-range partition dirs instead of throwing") {
    val outDir = Files.createTempDirectory("graft_s4e_").toString
    val batch = Seq(Telemetry("s1", 31, ts("2024-03-05 16:10:00"))).toDF()
    PartitionedJsonSink.writeBatchWithDelayedMarkers(
      graft.ops.SensorOps.avgWithPartitions(batch), outDir,
      ts("2024-03-05 16:30:00"), delayMinutes = 1L)
    // a null-event-time Hive default dir, a stray non-numeric dir, and an
    // out-of-range hour: commitClosedPartitions runs AFTER the append, so
    // a throw here would turn every foreachBatch retry into a re-append
    val day = Paths.get(outDir, "year=2024", "month=3", "day=5")
    Files.createDirectories(day.resolve("hour=__HIVE_DEFAULT_PARTITION__"))
    Files.createDirectories(day.resolve("hour=99"))
    Files.createDirectories(Paths.get(outDir, "year=junk", "month=3", "day=5", "hour=1"))
    val n = PartitionedJsonSink.commitClosedPartitions(
      outDir, ts("2024-03-05 18:01:00"), delayMinutes = 1L)
    assert(n == 1, "only the real hour=16 partition commits")
    assert(Files.exists(day.resolve("hour=16").resolve("_SUCCESS")))
    assert(!Files.exists(day.resolve("hour=__HIVE_DEFAULT_PARTITION__").resolve("_SUCCESS")))
    assert(!Files.exists(day.resolve("hour=99").resolve("_SUCCESS")))
  }

  test("marker pass refuses to collect a high-cardinality partition list") {
    val outDir = Files.createTempDirectory("graft_s4c_").toString
    // 3 distinct (year,month,day,hour) tuples against a guard of 2
    val batch = Seq(
      Telemetry("s1", 31, ts("2024-03-05 15:00:01")),
      Telemetry("s1", 31, ts("2024-03-05 16:00:01")),
      Telemetry("s1", 31, ts("2024-03-05 17:00:01"))).toDF()
    val avgs = graft.ops.SensorOps.avgWithPartitions(batch)
    val e = intercept[IllegalArgumentException] {
      PartitionedJsonSink.writeBatchWithSuccessMarkers(avgs, outDir, maxPartitions = 2)
    }
    assert(e.getMessage.contains("partition directories"))
    // the guard must trip BEFORE the append write: a post-write failure
    // would leave a poison batch that re-appends on every retry
    assert(Files.list(Paths.get(outDir)).iterator().asScala.isEmpty,
      "guard refused the batch but data was already written")
  }
}
