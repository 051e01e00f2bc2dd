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

  /** LEFT OUTER interval join — [[interval]]'s match rule, but a left
    * row with NO right match within its interval is still EMITTED
    * (right columns NULL) once the right-side watermark has passed the
    * interval's upper edge, because only then is "no match" final
    * rather than "not yet". This is the join an enrichment pipeline
    * needs when absence is itself signal (an order with no payment
    * within 30s IS the alert). The delayed null-side emission is
    * engine semantics, not a quirk: outer results trail inner results
    * by up to the watermark delay + upper bound.
    *
    * Same state contract as [[interval]]: both sides watermarked, the
    * range condition bounds buffering to O(rate × window).
    */
  def intervalOuter(
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
        rightTime <= leftTime + expr(upperBound),
      "left_outer")
  }

  /** RIGHT OUTER interval join — the mirror of [[intervalOuter]]: a
    * right row with NO left match within any interval that could
    * contain it is emitted (left columns NULL) once the LEFT watermark
    * has passed far enough that no future left row's interval can
    * still claim it. The payment-with-no-order direction of the same
    * enrichment contract; same O(rate × window) state bound.
    */
  def intervalRightOuter(
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
        rightTime <= leftTime + expr(upperBound),
      "right_outer")
  }

  /** FULL OUTER interval join — both [[intervalOuter]] directions at
    * once: matched pairs stream out as inner results; each side's
    * unmatched rows surface with the other side NULL once the OTHER
    * side's watermark finalizes "no match". The reconciliation shape
    * (orders vs payments where EITHER missing is signal). Null-side
    * rows trail inner rows by up to watermark delay + bound — engine
    * semantics, same state contract as [[interval]].
    */
  def intervalFullOuter(
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
        rightTime <= leftTime + expr(upperBound),
      "full_outer")
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
