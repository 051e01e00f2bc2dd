package graft.jobs

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.{EngineConf, Telemetry}

/** Streaming semantics of Q1 under watermarking (SURVEY.md §5 item 4):
  * fire-once append output, late-data drop, strict HAVING — driven through
  * MemoryStream micro-batches (the watermark advances at batch
  * boundaries, SURVEY.md §1.4).
  */
class StreamingPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val conf = EngineConf.default

  private def runBatches(batches: Seq[Seq[Telemetry]]): List[(String, Long)] = {
    val mem = MemoryStream[Telemetry](spark)
    val query = SensorPipeline.alertStream(mem.toDF(), conf)
      .writeStream.format("memory").queryName("alerts_out").outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b); query.processAllAvailable() }
    } finally query.stop()
    spark.table("alerts_out")
      .select(col("sensor_id"), col("count_temp"))
      .as[(String, Long)].collect().toList.sorted
  }

  test("Q1 streaming: window fires once after watermark passes end; late rows dropped") {
    val w0 = (0 until 4).map(i => Telemetry("s1", 31, ts(s"2024-01-01 00:00:0$i")))
    // advances watermark to 00:01:40 - 5s, closing window [00:00:00, 00:00:30)
    val advance = Seq(Telemetry("s2", 20, ts("2024-01-01 00:01:40")))
    // late arrival for the already-closed window — must be dropped, so s3
    // never reaches the count>3 threshold
    val late = (0 until 5).map(i => Telemetry("s3", 31, ts(s"2024-01-01 00:00:0$i")))
    val out = runBatches(Seq(w0, advance, late, Seq(Telemetry("s2", 20, ts("2024-01-01 00:05:00")))))
    assert(out == List(("s1", 4L)))
  }

  test("Q1 streaming: watermark delay tolerates in-window disorder <= 5s") {
    val batch1 = Seq(
      Telemetry("s1", 31, ts("2024-01-01 00:00:10")),
      Telemetry("s1", 31, ts("2024-01-01 00:00:12")))
    // max event 00:00:12 -> watermark 00:00:07; these are older but above
    // the watermark, so they still count
    val batch2 = Seq(
      Telemetry("s1", 31, ts("2024-01-01 00:00:08")),
      Telemetry("s1", 31, ts("2024-01-01 00:00:09")))
    val advance = Seq(Telemetry("s2", 20, ts("2024-01-01 00:01:00")))
    val out = runBatches(Seq(batch1, batch2, advance))
    assert(out == List(("s1", 4L)))
  }

  test("Q2 streaming: truncated average emitted with partition columns") {
    val mem = MemoryStream[Telemetry](spark)
    val query = SensorPipeline.avgStream(mem.toDF(), conf)
      .writeStream.format("memory").queryName("avg_out").outputMode("append").start()
    try {
      mem.addData(Seq(
        Telemetry("s1", 31, ts("2024-01-01 10:00:01")),
        Telemetry("s1", 32, ts("2024-01-01 10:00:02"))))
      query.processAllAvailable()
      mem.addData(Seq(Telemetry("s2", 20, ts("2024-01-01 10:02:00"))))
      query.processAllAvailable()
    } finally query.stop()
    val rows = spark.table("avg_out")
      .select(col("sensor_id"), col("avg_temp"), col("year"), col("hour"))
      .as[(String, Long, Long, Long)].collect().toList
    assert(rows == List(("s1", 31L, 2024L, 10L)))
  }
}
