package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

/** Stream–stream joins (SURVEY.md §2.3 joins row: "stream–stream join with
  * watermarks"). Spark requires both sides watermarked and an event-time
  * range constraint so join state can be evicted; this wrapper states that
  * contract once.
  *
  * State scale: each side buffers rows until the watermark passes
  * `upper` — state is O(rate × window), independent of stream length.
  */
object StreamJoins {

  /** Inner interval join: rows match when `rightTime` ∈
    * [leftTime + lowerBound, leftTime + upperBound] and keys are equal.
    * Bounds are SQL interval strings (e.g. "INTERVAL 30 SECONDS").
    */
  def interval(
      left: DataFrame,
      right: DataFrame,
      keyCond: Column,
      leftTime: Column,
      rightTime: Column,
      lowerBound: String,
      upperBound: String
  ): DataFrame = {
    import org.apache.spark.sql.functions.expr
    left.join(right,
      keyCond &&
        rightTime >= leftTime + expr(lowerBound) &&
        rightTime <= leftTime + expr(upperBound))
  }

  /** Stream–static dimension enrichment: join each streaming record to a
    * (small) static dimension table, broadcast so the stream side never
    * shuffles and no join state accumulates — the standard lookup-table
    * enrichment every alerting/ETL pipeline performs. Left join so
    * records with no dimension row survive (nulls, not drops); the static
    * side is re-resolvable per micro-batch, so a dimension refresh (file
    * overwrite) is picked up without restarting the query.
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      keys: Seq[String]
  ): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    stream.join(broadcast(dim), keys, "left")
  }
}
