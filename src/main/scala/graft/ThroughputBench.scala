package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.EngineConf
import graft.jobs.{SensorPipeline, TelemetryGenerator}

/** Streaming throughput measurement: N synthetic telemetry records
  * (producer-faithful distributions) pushed through the full Q1 alert
  * pipeline — watermark, windowed count, having — via the streaming
  * engine (availableNow) and via the batch operator. Prints one JSON
  * line with records/second for each path.
  *
  * Reference envelope: the producer Lambda's steady state is ~0.33 rec/s
  * (99 records / 300 s, `kfpLambdaStreamProducer.py:48`,
  * `msk_flink_streaming_stack.py:223`).
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_THROUGHPUT_ROWS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stage = Files.createTempDirectory("graft_tp_").toString
    TelemetryGenerator.batch(spark, n, startEpochSec = 1704067200L, recordsPerSecond = 100.0)
      .write.parquet(s"$stage/in")
    val schema = spark.read.parquet(s"$stage/in").schema

    // batch path
    val t0 = System.nanoTime()
    val batchAlerts = graft.ops.SensorOps.alerts(spark.read.parquet(s"$stage/in")).count()
    val batchSec = (System.nanoTime() - t0) / 1e9

    // streaming path (availableNow drain through watermark + window state)
    val t1 = System.nanoTime()
    val stream = spark.readStream.schema(schema).parquet(s"$stage/in")
    val query = SensorPipeline.alertStream(stream, EngineConf.default)
      .writeStream.format("noop")
      .option("checkpointLocation", s"$stage/chk")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    val streamSec = (System.nanoTime() - t1) / 1e9

    println(s"""{"metric":"throughput","rows":$n,"batch_sec":$batchSec,""" +
      s""""batch_rows_per_sec":${(n / batchSec).toLong},""" +
      s""""stream_sec":$streamSec,"stream_rows_per_sec":${(n / streamSec).toLong},""" +
      s""""batch_alerts":$batchAlerts}""")
    spark.stop()
  }
}
