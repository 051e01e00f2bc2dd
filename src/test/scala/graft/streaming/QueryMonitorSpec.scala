package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.{EngineConf, Telemetry}
import graft.jobs.SensorPipeline

class QueryMonitorSpec extends SparkTestBase {
  import spark.implicits._

  test("monitor records batch input rows and advancing watermark") {
    val monitor = QueryMonitor.attach(spark)
    val mem = MemoryStream[Telemetry](spark)
    val query = SensorPipeline.alertStream(mem.toDF(), EngineConf.default)
      .writeStream.format("memory").queryName("mon_out").outputMode("append").start()
    try {
      mem.addData(Seq(Telemetry("s1", 31, ts("2024-01-01 00:00:00"))))
      query.processAllAvailable()
      mem.addData(Seq(Telemetry("s1", 31, ts("2024-01-01 00:05:00"))))
      query.processAllAvailable()
      // progress reports the watermark USED in that batch (derived from
      // the previous batch's data) — a third batch shows the advance
      mem.addData(Seq(Telemetry("s1", 31, ts("2024-01-01 00:06:00"))))
      query.processAllAvailable()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 20000
      while (monitor.batches.count(_.numInputRows > 0) < 3 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally {
      query.stop()
      spark.streams.removeListener(monitor)
    }
    val withRows = monitor.batches.filter(_.numInputRows > 0)
    assert(withRows.size >= 2, s"expected >=2 data batches, got ${monitor.batches}")
    assert(withRows.forall(_.queryName == "mon_out"))
    assert(withRows.exists(_.watermark.startsWith("2024-01-01T00:04")),
      s"watermark should advance to 00:04:55, got ${withRows.map(_.watermark)}")
  }

  test("windowed aggregation in update mode emits incremental results") {
    val mem = MemoryStream[Telemetry](spark)
    val agg = mem.toDF()
      .withWatermark("event_time", "5 seconds")
      .groupBy(window(col("event_time"), "30 seconds"), col("sensor_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("sensor_id"), col("n"))
    val query = agg.writeStream.format("memory")
      .queryName("upd_out").outputMode("update").start()
    try {
      mem.addData(Seq(Telemetry("s1", 31, ts("2024-01-01 00:00:01"))))
      query.processAllAvailable()
      mem.addData(Seq(Telemetry("s1", 31, ts("2024-01-01 00:00:02"))))
      query.processAllAvailable()
    } finally query.stop()
    // update mode re-emits the group on every change: n=1 then n=2
    val out = spark.table("upd_out").as[(String, Long)].collect().toList.sorted
    assert(out == List(("s1", 1L), ("s1", 2L)), s"got $out")
  }
}
