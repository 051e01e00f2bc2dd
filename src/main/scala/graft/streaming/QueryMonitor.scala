package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Operational monitoring for streaming queries: records per-batch input
  * rows, processing rate, and watermark from the engine's progress events
  * — the data an operator dashboards/alerts on (the reference's analog is
  * the managed Flink metrics surface).
  */
class QueryMonitor extends StreamingQueryListener {

  case class BatchProgress(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      watermark: String)

  private val progress = new ConcurrentLinkedQueue[BatchProgress]()

  def batches: List[BatchProgress] = progress.asScala.toList

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    progress.add(BatchProgress(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId,
      p.numInputRows,
      Option(p.eventTime.get("watermark")).getOrElse("")))
  }

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

object QueryMonitor {
  /** Attach a fresh monitor to the session; caller removes it via
    * `spark.streams.removeListener`.
    */
  def attach(spark: SparkSession): QueryMonitor = {
    val m = new QueryMonitor
    spark.streams.addListener(m)
    m
  }
}
