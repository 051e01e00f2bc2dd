package graft.io

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}

import graft.ops.SensorOps

/** S7 — per-record alert fan-out (SURVEY.md §2.1).
  *
  * The reference's consumer Lambda decodes each Kafka record on the alert
  * topic and publishes one SNS message per record
  * (`kfpLambdaConsumerSNS.py:12-23`). The engine models that terminal hop
  * as a pluggable notifier invoked per alert row from
  * `writeStream.foreach(...)`; SNS itself is infrastructure, not engine.
  */
trait AlertSink extends Serializable {
  /** One notification per alert record (`kfpLambdaConsumerSNS.py:19-22`). */
  def send(subject: String, message: String): Unit
}

/** Default sink: log to stdout (local/dev parity with SNS email). */
class LoggingAlertSink extends AlertSink {
  override def send(subject: String, message: String): Unit =
    println(s"[alert] $subject :: $message")
}

/** Test sink: collect into a static queue (single-JVM local mode). */
class CollectingAlertSink extends AlertSink {
  override def send(subject: String, message: String): Unit =
    CollectingAlertSink.queue.add(subject -> message)
}

object CollectingAlertSink {
  val queue = new ConcurrentLinkedQueue[(String, String)]()
  def drain(): List[(String, String)] = {
    val out = queue.asScala.toList
    queue.clear()
    out
  }
}

object AlertDispatch {
  /** Subject used by the reference consumer, verbatim
    * (`kfpLambdaConsumerSNS.py:17`).
    */
  val subject = "The sensor reading has exceeded the threshold"

  /** ForeachWriter bridging a streaming alert DataFrame to an AlertSink;
    * expects a `message` column (built by [[SensorOps.alertMessage]]).
    */
  def writer(sink: AlertSink): ForeachWriter[Row] = new ForeachWriter[Row] {
    override def open(partitionId: Long, epochId: Long): Boolean = true
    override def process(row: Row): Unit =
      sink.send(subject, row.getAs[String]("message"))
    override def close(errorOrNull: Throwable): Unit = ()
  }

  /** Project alert rows to the human-readable message the reference
    * interpolates (`kfpLambdaConsumerSNS.py:17-18`).
    */
  def messages(alerts: DataFrame): DataFrame =
    alerts.withColumn("message", SensorOps.alertMessage())
}
