package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipeline observability via Spark's `observe` API (the
  * `CollectMetrics` plan node): named aggregate metrics ride the query
  * itself — computed incrementally per micro-batch, reported in every
  * `StreamingQueryProgress.observedMetrics` — so the ops console reads
  * throughput/completeness numbers WITHOUT a second query over the
  * stream (a parallel metrics aggregation would double the source read
  * and could disagree with what the pipeline actually processed).
  *
  * The reference pipeline's only observability is CloudWatch container
  * metrics (`msk-flink-streaming-cdk`'s CDK wiring); record-level
  * metrics like these are what its operators actually page on.
  */
object Observability {

  /** Attach the standard telemetry health metrics to a frame (works on
    * streaming AND batch plans — `observe` is a plan node, not an
    * action):
    *  - `n_rows`: records seen this batch;
    *  - `n_null_ts`: records with no event time (they silently skip
    *    every watermark-governed operator — the first completeness
    *    number to alarm on);
    *  - `max_event_sec`: the newest event time processed, whose lag
    *    against wall-clock is end-to-end freshness.
    *
    * Metrics cost one map-side aggregate fused into the existing plan:
    * no extra shuffle, no second scan.
    */
  def withHealthMetrics(
      df: DataFrame,
      tsCol: Column,
      name: String = "graft_health"
  ): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(tsCol.isNull.cast("long")).as("n_null_ts"),
      max(unix_timestamp(tsCol)).as("max_event_sec"))
}
