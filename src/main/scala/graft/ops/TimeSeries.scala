package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling operators.
  *
  * Scale shape: gap filling is one per-key aggregate (min/max span), a
  * generator over the span (no data movement — rows are produced where
  * the key row lives), and one left join back onto the per-bucket
  * aggregates, shuffled on (key, bucket). Span explosion is bounded by
  * `maxBuckets` so a single pathological key (one event in 1970, one
  * today) cannot OOM an executor — at 100 TB that guard is the
  * difference between a linear operator and a stuck stage.
  */
object TimeSeries {

  /** Per-key, per-day event counts with missing days zero-filled across
    * each key's observed [min-day, max-day] span. Output: key, `day_sec`
    * (epoch seconds of day start, BIGINT), `n_events` (0 for gap days).
    *
    * NOT a silent cap: a key whose span exceeds `maxBuckets` days is
    * DROPPED from the output entirely (not truncated) — callers that
    * need those keys should pre-split their spans or raise the bound;
    * rows with NULL timestamps never join a day bucket and are excluded.
    */
  def gapFillDaily(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      maxBuckets: Int = 100000
  ): DataFrame = {
    val daySec = (floor(unix_timestamp(tsCol) / 86400L) * 86400L).cast("long")
    // counts feed BOTH the span aggregate and the final join — without
    // materialization the raw table is scanned twice (plan-audited);
    // the per-(key, day) aggregate is tiny relative to raw, so cutting
    // lineage here is the 100 TB-correct shape.
    val counts = df.select(keyCol.as("key"), daySec.as("day_sec"))
      .groupBy("key", "day_sec")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val spans = counts.groupBy("key")
      .agg(min(col("day_sec")).as("lo"), max(col("day_sec")).as("hi"))
      .filter((col("hi") - col("lo")) / 86400L < maxBuckets)
    spans
      .select(col("key"),
        explode(sequence(col("lo"), col("hi"), lit(86400L))).as("day_sec"))
      .join(counts, Seq("key", "day_sec"), "left")
      .select(col("key"), col("day_sec"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }
}
