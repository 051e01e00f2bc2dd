package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.EngineConf
import graft.io.{KafkaJson, PartitionedJsonSink}
import graft.ops.SensorOps

/** S5 — the multi-sink job (SURVEY.md §2.1).
  *
  * The reference assembles both INSERT queries into ONE Flink statement set
  * sharing a single Kafka scan (`PythonKafkaSink/main.py:10,146-149`). Spark
  * plans each `StreamingQuery` separately, so the engine offers both modes
  * (SURVEY.md §7.4 item 2):
  *
  *  - [[startTwoQueries]] — idiomatic Spark: two independent queries, the
  *    topic is consumed twice. Default.
  *  - [[startSharedScan]] — single scan + `foreachBatch` fan-out with
  *    `persist()`, closest to the reference's statement-set plan sharing.
  */
object SensorPipeline {

  /** Q1 with event-time watermark (5 s bounded out-of-orderness,
    * `main.py:18`) in append mode — fire-once-per-window, late data
    * dropped, same observable contract as the Flink group window
    * (SURVEY.md §1.4).
    */
  def alertStream(telemetry: DataFrame, conf: EngineConf): DataFrame =
    SensorOps.alertsStreaming(
      telemetry.withWatermark("event_time", conf.watermarkDelay),
      windowLen = conf.alertWindow,
      threshold = conf.hotThreshold.toDouble,
      minCount = conf.alertMinCount)

  /** Q2 with watermark + date-part partition columns (`main.py:90-96`). */
  def avgStream(telemetry: DataFrame, conf: EngineConf): DataFrame =
    SensorOps.avgWithPartitions(
      telemetry.withWatermark("event_time", conf.watermarkDelay),
      windowLen = conf.avgWindow)

  /** Mode (a): two independent streaming queries (idiomatic). */
  def startTwoQueries(spark: SparkSession, conf: EngineConf): Seq[StreamingQuery] = {
    def freshSource() = KafkaJson.source(spark, conf.bootstrapServers, conf.inputTopic)
    val alerts = KafkaJson.sink(
      alertStream(freshSource(), conf),
      conf.bootstrapServers, conf.outputTopic, s"${conf.checkpointDir}/alerts").start()
    val avgs = PartitionedJsonSink.writer(
      avgStream(freshSource(), conf),
      conf.outputPath, s"${conf.checkpointDir}/avgs").start()
    Seq(alerts, avgs)
  }

  /** Mode (b): one scan, `foreachBatch` fan-out with persist — statement-set
    * parity (`main.py:146-149`). Windowed aggregation state cannot live
    * inside foreachBatch, so this mode applies both aggregations per
    * micro-batch over the *watermarked* source stream via two derived
    * streaming queries is NOT equivalent; instead the fan-out keeps the raw
    * scan single and both aggregations are planned over the same persisted
    * batch as complete recomputations — appropriate when the upstream batch
    * is already window-complete. For true streaming semantics prefer mode
    * (a); this mode exists for scan-sharing parity experiments.
    */
  def startSharedScan(
      spark: SparkSession,
      conf: EngineConf,
      source: DataFrame
  ): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", s"${conf.checkpointDir}/shared")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          val alerts = SensorOps.alerts(
            batch, windowLen = conf.alertWindow,
            threshold = conf.hotThreshold.toDouble, minCount = conf.alertMinCount)
          KafkaJson.encode(alerts).write
            .format("kafka")
            .option("kafka.bootstrap.servers", conf.bootstrapServers)
            .option("topic", conf.outputTopic)
            .save()
          val avgs = SensorOps.avgWithPartitions(batch, windowLen = conf.avgWindow)
          PartitionedJsonSink.writeBatchWithSuccessMarkers(avgs, conf.outputPath)
        } finally batch.unpersist()
      }
      .start()
}
