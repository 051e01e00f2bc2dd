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
  case class SessionList(sessions: List[SessionAgg])
  case class SessionOut(sensor_id: String, session_start: Timestamp, n_events: Long)

  /** Gap-based sessionization with explicit state + event-time timeout,
    * matching Spark's `session_window` append semantics: a session is
    * emitted ONLY once the watermark passes `session end + gap`, i.e. once
    * no admissible (above-watermark) event can still extend or merge it.
    * Until then closed-looking sessions are HELD in state — so an
    * out-of-order event that lands between two held sessions merges them,
    * and no overlapping session rows are ever emitted. State per key is
    * O(held sessions), bounded by the watermark horizon / gap; the
    * event-time timeout flushes held sessions as the watermark advances,
    * so the operator runs indefinitely at any key cardinality.
    */
  def sessionize(telemetry: Dataset[Telemetry], gapMs: Long,
                 watermarkDelay: String = "5 seconds"): Dataset[SessionOut] = {
    import telemetry.sparkSession.implicits._
    telemetry
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.sensor_id)
      .flatMapGroupsWithState[SessionList, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[Telemetry], state: GroupState[SessionList]) =>
          // One path serves both data batches and timeout wake-ups (empty
          // rows): merge events into held sessions, emit the safe ones.
          val wm = state.getCurrentWatermarkMs()
          val events = rows.filter(_.event_time != null).toSeq
            .map(_.event_time.getTime).sorted
          // Interval-merge: held sessions and each event are [start, last]
          // intervals, sorted by start; any adjacent pair within gapMs
          // merges — an out-of-order event with t < start extends the
          // session backward, and an event bridging two intervals (or two
          // held sessions) merges them.
          val intervals =
            (state.getOption.map(_.sessions).getOrElse(Nil) ++
              events.map(t => SessionAgg(t, t, 1))).sortBy(s => (s.start, s.last))
          val merged = intervals.foldLeft(List.empty[SessionAgg]) {
            case (cur :: done, s) if s.start - cur.last <= gapMs =>
              SessionAgg(cur.start, math.max(cur.last, s.last), cur.count + s.count) :: done
            case (acc, s) => s :: acc
          }.reverse
          // Safe to emit once the watermark is strictly past last + gap:
          // any future admissible event has t >= wm > last + gap and
          // cannot merge into the session.
          val (safe, held) = merged.partition(s => s.last + gapMs < wm)
          if (held.isEmpty) state.remove()
          else {
            state.update(SessionList(held))
            // wake when the earliest held session becomes safe (timeout
            // timestamps must sit above the current watermark)
            state.setTimeoutTimestamp(
              math.max(held.map(_.last + gapMs).min, wm + 1))
          }
          safe.iterator.map(s => SessionOut(key, new Timestamp(s.start), s.count))
      }
  }
}
