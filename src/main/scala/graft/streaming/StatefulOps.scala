package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Telemetry

/** Custom stateful streaming operators (SURVEY.md §2.3: the reference's
  * only state is the implicit window-agg state; `flatMapGroupsWithState`
  * is the engine's extension point for state Flink would express with a
  * `KeyedProcessFunction`).
  */
object StatefulOps {

  /** Streaming exact dedup bounded by the watermark horizon — the
    * streaming analog of `Dedup.exactDedup` (state is evicted once the
    * watermark guarantees no more duplicates can arrive).
    */
  def dedupWithinWatermark(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicatesWithinWatermark(cols.head, cols.tail: _*)

  case class SessionAgg(start: Long, last: Long, count: Long)
  case class SessionOut(sensor_id: String, session_start: Timestamp, n_events: Long)

  /** Gap-based sessionization with explicit state + event-time timeout.
    * A session closes when the gap to the next event exceeds `gapMs`
    * (closed inline) or when the watermark passes `last + gapMs` (closed
    * by timeout). State per key is O(1); timeouts bound its lifetime, so
    * the operator runs indefinitely at any key cardinality.
    */
  def sessionize(telemetry: Dataset[Telemetry], gapMs: Long,
                 watermarkDelay: String = "5 seconds"): Dataset[SessionOut] = {
    import telemetry.sparkSession.implicits._
    telemetry
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.sensor_id)
      .flatMapGroupsWithState[SessionAgg, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[Telemetry], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(key, new Timestamp(s.start), s.count))
          } else {
            // Interval-merge semantics, matching Spark's session_window:
            // treat the stored session and each event as [start, last]
            // intervals, sort by start, and merge any pair within gapMs —
            // so an out-of-order event with t < state.start (still above
            // the watermark) extends the session's start BACKWARD to
            // min(t, start), and events bridging two intervals merge them.
            val events = rows.filter(_.event_time != null).toSeq
              .map(_.event_time.getTime).sorted
            val intervals = (state.getOption.toSeq ++ events.map(t => SessionAgg(t, t, 1)))
              .sortBy(s => (s.start, s.last))
            val merged = intervals.foldLeft(List.empty[SessionAgg]) {
              case (cur :: done, s) if s.start - cur.last <= gapMs =>
                SessionAgg(cur.start, math.max(cur.last, s.last), cur.count + s.count) :: done
              case (acc, s) => s :: acc
            }.reverse
            // all but the newest session have a gap to their successor and
            // close inline; the newest stays in state until its timeout
            merged.lastOption.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            merged.dropRight(1).iterator
              .map(s => SessionOut(key, new Timestamp(s.start), s.count))
          }
      }
  }
}
