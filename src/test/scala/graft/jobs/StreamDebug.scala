package graft.jobs

/** Scratch debug main for streaming emission (not a test). */
object StreamDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.core.{EngineConf, Telemetry}
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val mem = MemoryStream[Telemetry](spark)
    val query = SensorPipeline.alertStream(mem.toDF(), EngineConf.default)
      .writeStream.format("memory").queryName("dbg_out").outputMode("append").start()
    val batches = Seq(
      (0 until 4).map(i => Telemetry("s1", 31, ts(s"2024-01-01 00:00:0$i"))),
      Seq(Telemetry("s2", 20, ts("2024-01-01 00:01:40"))),
      (0 until 5).map(i => Telemetry("s3", 31, ts(s"2024-01-01 00:00:0$i"))),
      Seq(Telemetry("s2", 20, ts("2024-01-01 00:05:00"))))
    batches.zipWithIndex.foreach { case (b, i) =>
      mem.addData(b)
      query.processAllAvailable()
      val p = query.lastProgress
      println(s"=== batch $i watermark=${p.eventTime.get("watermark")} " +
        s"stateRows=${if (p.stateOperators.isEmpty) "-" else p.stateOperators(0).numRowsTotal}")
    }
    println("rows: " + spark.table("dbg_out").collect().mkString("; "))
    query.stop()
    spark.stop()
  }
}
