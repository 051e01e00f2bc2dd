package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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
          val merged = mergeIntervals(
            state.getOption.map(_.sessions).getOrElse(Nil), events, gapMs)
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

  /** Shared interval-merge: held sessions + new event timestamps →
    * merged session list (any adjacent pair within gapMs merges).
    */
  private[streaming] def mergeIntervals(
      prior: List[SessionAgg], events: Seq[Long], gapMs: Long): List[SessionAgg] = {
    val intervals = (prior ++ events.map(t => SessionAgg(t, t, 1)))
      .sortBy(s => (s.start, s.last))
    intervals.foldLeft(List.empty[SessionAgg]) {
      case (cur :: done, s) if s.start - cur.last <= gapMs =>
        SessionAgg(cur.start, math.max(cur.last, s.last), cur.count + s.count) :: done
      case (acc, s) => s :: acc
    }.reverse
  }

  case class BandDoc(id: Long, band: Int, bkey: String, event_time: Timestamp)

  /** One band collision from [[nearDupHits]]: `id` shares `band` with
    * the earlier `first_id`; `n_seen` is how many documents this band
    * bucket had ALREADY seen when the hit fired (bucket heat — a
    * boilerplate bucket reads in the thousands while a genuine near-dup
    * pair reads 1; under `stateVersion = 1` writes it is per-batch
    * only, see `StateCodec.encodeMinSeen`).
    */
  case class BandHit(id: Long, band: Int, first_id: Long, n_seen: Long)

  /** The PERMANENT stored-state schema of the envelope-wrapped stateful
    * ops ([[nearDupHits]]/[[capPerKeyStream]]/[[funnelStream]]): a
    * version tag plus an opaque payload. `flatMapGroupsWithState`
    * derives the checkpoint state schema from this class, and Spark's
    * state-schema check (`spark.sql.streaming.stateStore
    * .stateSchemaCheck`, default on) rejects a restart when it changes —
    * so the schema Spark sees is frozen HERE, and state evolution
    * happens inside `payload`, dispatched on `version` by
    * [[StateCodec]]. Round-10 history made this concrete: adding
    * `horizonMs` to the state classes stranded any pre-change
    * checkpoint; under the envelope the same change is a new payload
    * version plus a decoder arm.
    */
  case class VersionedState(version: Int, payload: Array[Byte])

  /** Fixed-layout big-endian payload codecs for [[VersionedState]] —
    * explicit byte layouts, NOT Java serialization, so a refactor of the
    * in-memory case classes cannot silently change what checkpoints
    * hold (the spec pins the exact v1 bytes). Each decoder dispatches on
    * the stored version: an arm per historical layout, defaults filled
    * for fields that version predates. An UNKNOWN (newer) version fails
    * loudly with the runbook — state written by a newer engine is not
    * guessable, and the operator must not fabricate quota/dedup state.
    */
  object StateCodec {
    import java.nio.ByteBuffer

    private def runbook: String =
      "Runbook: either upgrade the engine to the version that wrote " +
        "the checkpoint, or restart the query with a FRESH checkpoint " +
        "location (state re-accumulates over the watermark horizon)."

    private def unknown(op: String, v: Int): Nothing =
      throw new IllegalStateException(
        s"$op state version $v is newer than this engine understands. $runbook")

    /** A version the decoder DOES know but whose bytes don't fit that
      * version's layout (partial write, bitrot, encoder bug): still the
      * designed loud failure with the runbook, never a raw
      * BufferUnderflowException from inside the operator.
      */
    private def corrupt(op: String, s: VersionedState, cause: Throwable): Nothing =
      throw new IllegalStateException(
        s"$op state payload (version ${s.version}, ${s.payload.length} bytes) " +
          s"does not match that version's layout — corrupt checkpoint state. $runbook",
        cause)

    /** v1: [id: i64][horizonMs: i64].
      * v2 (current): v1 + [nSeen: i64] — the lifetime bucket-traffic
      * count behind `BandHit.n_seen` (the round-19 widening drill,
      * EwmaTail's precedent). `version = 1` writes the v1 layout,
      * DROPPING nSeen — the rolling-upgrade escape hatch. CONSUMER
      * CAVEAT: under `stateVersion = 1` the emitted `BandHit.n_seen`
      * restarts from the decode default 0 on EVERY micro-batch (never
      * persisted) — treat it as meaningless until the fleet is back on
      * v2; the dedup verdict (id/band/first_id) is version-independent.
      */
    def encodeMinSeen(s: MinSeen, version: Int = 2): VersionedState = version match {
      case 1 =>
        VersionedState(1,
          ByteBuffer.allocate(16).putLong(s.id).putLong(s.horizonMs).array())
      case 2 =>
        VersionedState(2,
          ByteBuffer.allocate(24).putLong(s.id).putLong(s.horizonMs)
            .putLong(s.nSeen).array())
      case v => throw new IllegalArgumentException(
        s"MinSeen encoder knows layout versions 1 and 2, not $v")
    }

    def decodeMinSeen(s: VersionedState): MinSeen = s.version match {
      case 1 =>
        // exact length, not just underflow: an OVERSIZED v1 payload means
        // an encoder grew the layout without bumping the version
        if (s.payload.length != 16) corrupt("MinSeen", s, null)
        val b = ByteBuffer.wrap(s.payload)
        // nSeen predates v1: the DOCUMENTED default is 0 — after a
        // v1 -> v2 checkpoint upgrade the bucket-heat counter restarts;
        // the dedup verdict (min id seen) carries over exactly
        MinSeen(b.getLong(), b.getLong(), nSeen = 0L)
      case 2 =>
        if (s.payload.length != 24) corrupt("MinSeen", s, null)
        val b = ByteBuffer.wrap(s.payload)
        MinSeen(b.getLong(), b.getLong(), b.getLong())
      case v => unknown("MinSeen", v)
    }

    /** v1: [accepted: i64][horizonMs: i64]. */
    def encodeQuota(s: QuotaCount): VersionedState =
      VersionedState(1,
        ByteBuffer.allocate(16).putLong(s.accepted).putLong(s.horizonMs).array())

    def decodeQuota(s: VersionedState): QuotaCount = s.version match {
      case 1 =>
        if (s.payload.length != 16) corrupt("QuotaCount", s, null)
        val b = ByteBuffer.wrap(s.payload)
        QuotaCount(b.getLong(), b.getLong())
      case v => unknown("QuotaCount", v)
    }

    /** v1: [n: i32][times: n × i64][horizonMs: i64]. */
    def encodeFunnel(s: FunnelTimes): VersionedState = {
      val b = ByteBuffer.allocate(4 + 8 * s.times.length + 8)
      b.putInt(s.times.length)
      s.times.foreach(b.putLong)
      b.putLong(s.horizonMs)
      VersionedState(1, b.array())
    }

    def decodeFunnel(s: VersionedState): FunnelTimes = s.version match {
      case 1 =>
        if (s.payload.length < 4) corrupt("FunnelTimes", s, null)
        val b = ByteBuffer.wrap(s.payload)
        val n = b.getInt()
        // exact length, and a corrupt count must not allocate
        if (n < 0 || s.payload.length != 4 + 8 * n + 8)
          corrupt("FunnelTimes", s, null)
        FunnelTimes(List.fill(n)(b.getLong()), b.getLong())
      case v => unknown("FunnelTimes", v)
    }

    /** v1: [n: i32][recent: n × i64, oldest first][horizonMs: i64].
      * v2 (current): v1 + [nSeen: i64] — the lifetime observation count
      * behind `EwmaOut.n_seen` (the round-17 widening drill). `version
      * = 1` writes the v1 layout, DROPPING nSeen — the rolling-upgrade
      * escape hatch: a fleet mid-upgrade keeps writing state the
      * previous engine still reads, at the cost of the widened field.
      * CONSUMER CAVEAT: under `stateVersion = 1` the emitted
      * `EwmaOut.n_seen` column restarts from the decode default 0 on
      * EVERY micro-batch (the counter is never persisted), so it reads
      * as a per-batch position, NOT the lifetime count — treat it as
      * meaningless until the fleet is back on v2.
      */
    def encodeEwma(s: EwmaTail, version: Int = 2): VersionedState = version match {
      case 1 =>
        val b = ByteBuffer.allocate(4 + 8 * s.recent.length + 8)
        b.putInt(s.recent.length)
        s.recent.foreach(b.putLong)
        b.putLong(s.horizonMs)
        VersionedState(1, b.array())
      case 2 =>
        val b = ByteBuffer.allocate(4 + 8 * s.recent.length + 16)
        b.putInt(s.recent.length)
        s.recent.foreach(b.putLong)
        b.putLong(s.horizonMs)
        b.putLong(s.nSeen)
        VersionedState(2, b.array())
      case v => throw new IllegalArgumentException(
        s"EwmaTail encoder knows layout versions 1 and 2, not $v")
    }

    def decodeEwma(s: VersionedState): EwmaTail = s.version match {
      case 1 =>
        if (s.payload.length < 4) corrupt("EwmaTail", s, null)
        val b = ByteBuffer.wrap(s.payload)
        val n = b.getInt()
        if (n < 0 || s.payload.length != 4 + 8 * n + 8)
          corrupt("EwmaTail", s, null)
        // nSeen predates v1: the DOCUMENTED default is 0 — after a
        // v1 -> v2 checkpoint upgrade the lifetime counter restarts;
        // the smoothing tail (what the math needs) carries over exactly
        EwmaTail(List.fill(n)(b.getLong()), b.getLong(), nSeen = 0L)
      case 2 =>
        if (s.payload.length < 4) corrupt("EwmaTail", s, null)
        val b = ByteBuffer.wrap(s.payload)
        val n = b.getInt()
        if (n < 0 || s.payload.length != 4 + 8 * n + 16)
          corrupt("EwmaTail", s, null)
        EwmaTail(List.fill(n)(b.getLong()), b.getLong(), b.getLong())
      case v => unknown("EwmaTail", v)
    }

    /** v1: [cusum: i64][horizonMs: i64]. */
    def encodeCusum(s: CusumState): VersionedState = {
      val b = ByteBuffer.allocate(16)
      b.putLong(s.cusum)
      b.putLong(s.horizonMs)
      VersionedState(1, b.array())
    }

    def decodeCusum(s: VersionedState): CusumState = s.version match {
      case 1 =>
        if (s.payload.length != 16) corrupt("CusumState", s, null)
        val b = ByteBuffer.wrap(s.payload)
        CusumState(b.getLong(), b.getLong())
      case v => unknown("CusumState", v)
    }

    /** v1: [lastUs: i64][lastSeq: i64][n: i64][ooo: i64][dup: i64]
      * [maxGapUs: i64][horizonMs: i64]. `lastUs = -1` marks "no prior
      * event" (epoch-us are non-negative); `maxGapUs = -1` marks "no
      * gap observed yet".
      */
    def encodeHygiene(s: HygieneState): VersionedState = {
      val b = ByteBuffer.allocate(56)
      b.putLong(s.lastUs); b.putLong(s.lastSeq); b.putLong(s.n)
      b.putLong(s.ooo); b.putLong(s.dup); b.putLong(s.maxGapUs)
      b.putLong(s.horizonMs)
      VersionedState(1, b.array())
    }

    def decodeHygiene(s: VersionedState): HygieneState = s.version match {
      case 1 =>
        if (s.payload.length != 56) corrupt("HygieneState", s, null)
        val b = ByteBuffer.wrap(s.payload)
        HygieneState(b.getLong(), b.getLong(), b.getLong(), b.getLong(),
          b.getLong(), b.getLong(), b.getLong())
      case v => unknown("HygieneState", v)
    }

    /** v1: [k: i32][hs: k × i64, ascending][nRows: i64][horizonMs: i64]. */
    def encodeKmv(s: KmvSketch): VersionedState = {
      val b = ByteBuffer.allocate(4 + 8 * s.hs.length + 16)
      b.putInt(s.hs.length)
      s.hs.foreach(b.putLong)
      b.putLong(s.nRows)
      b.putLong(s.horizonMs)
      VersionedState(1, b.array())
    }

    def decodeKmv(s: VersionedState): KmvSketch = s.version match {
      case 1 =>
        if (s.payload.length < 4) corrupt("KmvSketch", s, null)
        val b = ByteBuffer.wrap(s.payload)
        val n = b.getInt()
        if (n < 0 || s.payload.length != 4 + 8 * n + 16)
          corrupt("KmvSketch", s, null)
        KmvSketch(List.fill(n)(b.getLong()), b.getLong(), b.getLong())
      case v => unknown("KmvSketch", v)
    }

    /** v1: [nLeaves: i32][per leaf: l2Len i32 + utf8 bytes, nRows i64,
      * nh i32, hashes nh × i64][horizonMs: i64].
      */
    def encodeRollup(s: RollupState): VersionedState = {
      val leafBytes = s.leaves.map(l => (l, l.l2.getBytes("UTF-8")))
      val size = 4 + leafBytes.map { case (l, b2) =>
        4 + b2.length + 8 + 4 + 8 * l.hs.length }.sum + 8
      val b = ByteBuffer.allocate(size)
      b.putInt(s.leaves.length)
      leafBytes.foreach { case (l, b2) =>
        b.putInt(b2.length); b.put(b2); b.putLong(l.nRows)
        b.putInt(l.hs.length); l.hs.foreach(b.putLong)
      }
      b.putLong(s.horizonMs)
      VersionedState(1, b.array())
    }

    def decodeRollup(s: VersionedState): RollupState = s.version match {
      case 1 =>
        try {
          val b = ByteBuffer.wrap(s.payload)
          val nLeaves = b.getInt()
          if (nLeaves < 0) corrupt("RollupState", s, null)
          val leaves = List.fill(nLeaves) {
            val len = b.getInt()
            if (len < 0 || len > b.remaining()) corrupt("RollupState", s, null)
            val arr = new Array[Byte](len); b.get(arr)
            val nRows = b.getLong()
            val nh = b.getInt()
            if (nh < 0 || 8 * nh > b.remaining()) corrupt("RollupState", s, null)
            RollupLeaf(new String(arr, "UTF-8"), List.fill(nh)(b.getLong()), nRows)
          }
          val horizon = b.getLong()
          if (b.remaining() != 0) corrupt("RollupState", s, null)
          RollupState(leaves, horizon)
        } catch {
          case e: java.nio.BufferUnderflowException => corrupt("RollupState", s, e)
        }
      case v => unknown("RollupState", v)
    }

    /** v1: [nEntries: i32][per entry: value i64, count i64]
      * [total: i64][horizonMs: i64]. Entries sorted by value ascending.
      */
    def encodeGrid(s: GridHist): VersionedState = {
      val b = ByteBuffer.allocate(4 + 16 * s.entries.length + 16)
      b.putInt(s.entries.length)
      s.entries.foreach { case (v, c) => b.putLong(v); b.putLong(c) }
      b.putLong(s.total); b.putLong(s.horizonMs)
      VersionedState(1, b.array())
    }

    def decodeGrid(s: VersionedState): GridHist = s.version match {
      case 1 =>
        if (s.payload.length < 4) corrupt("GridHist", s, null)
        val b = ByteBuffer.wrap(s.payload)
        val n = b.getInt()
        if (n < 0 || s.payload.length != 4 + 16 * n + 16)
          corrupt("GridHist", s, null)
        GridHist(List.fill(n)((b.getLong(), b.getLong())), b.getLong(), b.getLong())
      case v => unknown("GridHist", v)
    }

    /** v1: [runMaxUs: i64][n: i64][nLate: i64][maxLateUs: i64]
      * [horizonMs: i64]. `runMaxUs = -1` marks "no prior event";
      * `maxLateUs = -1` marks "nothing late yet".
      */
    def encodeLate(s: LateState): VersionedState = {
      val b = ByteBuffer.allocate(40)
      b.putLong(s.runMaxUs); b.putLong(s.n); b.putLong(s.nLate)
      b.putLong(s.maxLateUs); b.putLong(s.horizonMs)
      VersionedState(1, b.array())
    }

    def decodeLate(s: VersionedState): LateState = s.version match {
      case 1 =>
        if (s.payload.length != 40) corrupt("LateState", s, null)
        val b = ByteBuffer.wrap(s.payload)
        LateState(b.getLong(), b.getLong(), b.getLong(), b.getLong(),
          b.getLong())
      case v => unknown("LateState", v)
    }

    /** v1: [y: i64][horizonMs: i64]. */
    def encodeAbSeen(s: AbSeen): VersionedState =
      VersionedState(1,
        ByteBuffer.allocate(16).putLong(s.y).putLong(s.horizonMs).array())

    def decodeAbSeen(s: VersionedState): AbSeen = s.version match {
      case 1 =>
        if (s.payload.length != 16) corrupt("AbSeen", s, null)
        val b = ByteBuffer.wrap(s.payload)
        AbSeen(b.getLong(), b.getLong())
      case v => unknown("AbSeen", v)
    }
  }

  /** In-memory state of [[nearDupHits]] (stored as [[VersionedState]]
    * payload, v2 current — see [[StateCodec]]). `nSeen` is the lifetime
    * count of documents observed in this band bucket (the round-19
    * widening drill — bucket heat, the online analogue of the batch
    * path's `maxBucketSize` diagnostics); it predates v1 layouts, whose
    * decode default is 0.
    */
  case class MinSeen(id: Long, horizonMs: Long, nSeen: Long = 0L)

  case class QuotaDoc(id: Long, key: String, event_time: Timestamp)
  case class QuotaCount(accepted: Long, horizonMs: Long)
  case class QuotaVerdict(id: Long, key: String, accepted: Boolean)

  /** Per-key ingest quota — the streaming twin of
    * `ext.Sampling.capPerKey`: accept the FIRST `n` rows of each key and
    * flag the rest, so a template-heavy source can't flood a live ingest
    * the way it would flood a batch corpus. Batch capPerKey draws a
    * uniform hash-subset (it sees all rows); an ingest quota by nature
    * takes arrival order — within each micro-batch, arrival is resolved
    * deterministically as (event_time, id), so a single-batch drain
    * accepts exactly the batch `row_number() over (partition by key
    * order by ts, id) <= n` prefix (spec-pinned parity), and replays
    * reproduce the same verdicts.
    *
    * Every row comes back as a [[QuotaVerdict]] (accepted or not) so the
    * caller can route rejects to a spillover/audit sink instead of
    * silently dropping — the at-least-once-friendly shape.
    *
    * Scale: one shuffle on the key; state is ONE long per key (accepted
    * count), evicted `ttlMs` past the active event-time horizon (rolling
    * quota; pass Long.MaxValue/2 for an effectively permanent cap). A hot
    * key's rows converge on one task per batch — bounded by batch size,
    * the same profile as any keyed stateful operator.
    */
  def capPerKeyStream(
      df: DataFrame,
      n: Int,
      keyCol: String = "source",
      idCol: String = "doc_id",
      tsCol: String = "event_time",
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[QuotaVerdict] = {
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val rows = df
      // NULL event_time rows are excluded, matching funnelStream's guard:
      // the (event_time, id) arrival sort and the TTL horizon both
      // dereference the timestamp, and one NULL record would otherwise
      // NPE the whole streaming query (FIXTURES.md: the reference's
      // watermark column is nullable and NULLs must be tolerated)
      .filter(col(tsCol).isNotNull)
      .select(col(idCol).as("id"), col(keyCol).cast("string").as("key"),
        col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[QuotaDoc]
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[VersionedState, QuotaVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, it: Iterator[QuotaDoc], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeQuota)
            val rs = it.toSeq.sortBy(r => (r.event_time.getTime, r.id))
            var accepted = prior.map(_.accepted).getOrElse(0L)
            val out = rs.map { r =>
              val ok = accepted < n
              if (ok) accepted += 1
              QuotaVerdict(r.id, r.key, ok)
            }
            // same MONOTONE event-time TTL anchoring as nearDupHits: the
            // horizon carried in state only ratchets up, so an
            // out-of-order batch of older (above-watermark) events never
            // pulls an armed timeout earlier — early eviction here would
            // hand the key a fresh quota and over-accept past n
            val horizon = (prior.map(_.horizonMs).toSeq ++
              rs.map(_.event_time.getTime) :+ state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeQuota(QuotaCount(accepted, horizon)))
            state.setTimeoutTimestamp(horizon + ttlMs)
            out.iterator
          }
      }
  }

  case class FunnelEvent(user: Long, et: String, event_time: Timestamp)
  case class FunnelTimes(times: List[Long], horizonMs: Long)
  case class FunnelProgress(user: Long, stage: Long, stage_time: Timestamp)

  case class EwmaEvent(key: Long, v: Long, ord: Long, event_time: Timestamp)
  /** `nSeen` (v2) is the key's lifetime observation count; it decodes
    * to 0 from a v1 checkpoint (the field predates that layout).
    */
  case class EwmaTail(recent: List[Long], horizonMs: Long, nSeen: Long = 0L)
  case class EwmaOut(key: Long, event_time: Timestamp, ord: Long, v: Long,
      ewma: Long, n_seen: Long)

  /** In-memory state of [[cusumStream]] (stored as [[VersionedState]]
    * payload v1 — see [[StateCodec]]): the running CUSUM statistic plus
    * the TTL horizon. O(1) per key — the whole point of the recursion.
    */
  case class CusumState(cusum: Long, horizonMs: Long)

  case class HygieneEvent(key: Long, us: Long, seq: Long, event_time: Timestamp)
  case class HygieneState(lastUs: Long, lastSeq: Long, n: Long, ooo: Long,
    dup: Long, maxGapUs: Long, horizonMs: Long)
  case class HygieneOut(key: Long, n_events: Long, n_ooo_adj: Long,
    n_dup_ts: Long, max_gap_sec: Option[Long])

  case class KmvEvent(key: String, hv: Long, event_time: Timestamp)

  /** In-memory state of [[kmvDistinctStream]] (stored as
    * [[VersionedState]] payload v1 — see [[StateCodec]]): the sorted
    * min-k distinct hash values, the raw row count, and the TTL
    * horizon — O(k) per key by construction.
    */
  case class KmvSketch(hs: List[Long], nRows: Long, horizonMs: Long)
  case class KmvOut(key: String, n_rows: Long, est_distinct: Long)

  /** In-memory state of [[lateStream]] (stored as [[VersionedState]]
    * payload v1 — see [[StateCodec]]): the running event-time max,
    * the counters, and the TTL horizon — five longs per key.
    */
  case class LateState(runMaxUs: Long, n: Long, nLate: Long,
    maxLateUs: Long, horizonMs: Long)
  case class LateOut(key: Long, n_events: Long, n_late: Long,
    max_late_ms: Option[Long])
  case class CusumOut(key: Long, event_time: Timestamp, ord: Long, v: Long,
                      cusum: Long, is_drift: Boolean)

  /** Streaming funnel tracking — the streaming twin of
    * `ops.Behavior.funnel`: per-user stage times advance as qualifying
    * events arrive, and each advancement is emitted ONCE as a
    * [[FunnelProgress]] row (append-friendly: a user's max emitted
    * `stage` is their current depth, and the row's time is that stage's
    * chosen time). Within a micro-batch events are processed in
    * (event_time, et) order, so a single-batch drain reproduces the
    * batch funnel's earliest-strictly-after chain exactly (spec-pinned
    * parity); the same holds across batches while events arrive in
    * event-time order. A LATE cross-batch event that would have enabled
    * an earlier chain cannot retract already-emitted progress — the
    * standard streaming-funnel approximation, bounded by the watermark.
    *
    * Scale: one shuffle on the user key; state is N stage epochs + the
    * monotone TTL horizon (same eviction contract as
    * [[capPerKeyStream]]), so state size tracks active users in the
    * horizon, not stream history.
    */
  def funnelStream(
      events: DataFrame,
      stages: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "event_time",
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "funnelStream needs at least one stage")
    import org.apache.spark.sql.functions._
    import events.sparkSession.implicits._
    val rows = events
      // NULL event_time / event_type rows are excluded, matching the
      // guarded sibling ops: the per-group sort below keys on both and
      // one NULL record would otherwise NPE the whole streaming query
      .filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol).as("user"), col(typeCol).as("et"),
        col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[FunnelEvent]
    val nStages = stages.size
    rows
      .groupByKey(_.user)
      .flatMapGroupsWithState[VersionedState, FunnelProgress](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, it: Iterator[FunnelEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeFunnel)
            val rs = it.toSeq.sortBy(r => (r.event_time.getTime, r.et))
            val times = prior.map(_.times.toArray)
              .getOrElse(Array.fill(nStages)(-1L))
            val out = List.newBuilder[FunnelProgress]
            rs.foreach { r =>
              val tMs = r.event_time.getTime
              // first unset stage this event can open: stage 0 freely,
              // stage i>0 only STRICTLY after stage i-1's chosen time
              var i = 0
              var done = false
              while (i < nStages && !done) {
                if (times(i) < 0 && stages(i) == r.et &&
                    (i == 0 || (times(i - 1) >= 0 && tMs > times(i - 1)))) {
                  times(i) = tMs
                  out += FunnelProgress(r.user, i + 1L, r.event_time)
                  done = true
                }
                i += 1
              }
            }
            val horizon = (prior.map(_.horizonMs).toSeq ++
              rs.map(_.event_time.getTime) :+ state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeFunnel(FunnelTimes(times.toList, horizon)))
            state.setTimeoutTimestamp(horizon + ttlMs)
            out.result().iterator
          }
      }
  }

  /** Streaming trailing EWMA — the streaming twin of
    * `ops.TimeSeries.ewmaTrailing`: each arriving observation is
    * smoothed against its key's last `weights.size − 1` values
    * (carried in state, oldest first) with the same exact integer
    * weights and head renormalization, and emitted once as an
    * [[EwmaOut]] row. Within a micro-batch events are processed in
    * (event_time, ord) order, so a single-batch drain reproduces the
    * batch operator row for row (spec-pinned parity); across batches
    * the tail continues, with the standard streaming approximation
    * that a LATE cross-batch event smooths against the tail as of its
    * arrival (the batch operator would re-sort history; bounded by
    * the watermark).
    *
    * Scale: one shuffle on the key; state is ≤ `weights.size − 1`
    * longs + the monotone TTL horizon (same eviction contract as
    * [[capPerKeyStream]]) — the live-keys working set, not history.
    *
    * `stateVersion = 1` (the rolling-upgrade escape hatch) writes the
    * v1 state layout, which does not persist the lifetime counter: the
    * emitted `n_seen` then restarts at 0 every micro-batch and must be
    * read as a per-batch position, not the lifetime count (see
    * `StateCodec.encodeEwma`).
    */
  def ewmaStream(
      df: DataFrame,
      weights: Seq[Long] = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L),
      keyCol: String = "user_id",
      tsCol: String = "event_time",
      valCol: String = "v",
      ordCol: String = "ord",
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L,
      stateVersion: Int = 2
  ): Dataset[EwmaOut] = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    require(stateVersion == 1 || stateVersion == 2,
      s"stateVersion must be 1 (rolling-upgrade compat) or 2: $stateVersion")
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val tail = weights.size - 1
    val rows = df
      // NULL guard: the arrival sort and TTL horizon dereference the
      // timestamp (the funnelStream contract)
      .filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      .select(col(keyCol).as("key"), col(valCol).cast("long").as("v"),
        col(ordCol).cast("long").as("ord"), col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[EwmaEvent]
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[VersionedState, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, it: Iterator[EwmaEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeEwma)
            // arrival order on FLOOR-SECONDS (then ord), matching the batch
            // twin `TimeSeries.ewmaTrailing`, which is driven on epoch
            // seconds (q161 passes unix_timestamp): sorting on raw millis
            // would order same-second events differently from the batch
            // operator whenever timestamps carry sub-second precision,
            // silently breaking the claimed row-for-row single-batch parity
            val rs = it.toSeq.sortBy(r =>
              (Math.floorDiv(r.event_time.getTime, 1000L), r.ord))
            var recent = prior.map(_.recent).getOrElse(Nil) // oldest first
            var seen = prior.map(_.nSeen).getOrElse(0L)
            val out = rs.map { r =>
              // taps: weights(0)·current, weights(k)·k-th newest of the tail
              val newestFirst = (r.v :: recent.reverse)
              var num = 0L; var den = 0L; var k = 0
              newestFirst.take(weights.size).foreach { x =>
                num += weights(k) * x; den += weights(k); k += 1
              }
              val ewma = Math.floorDiv(num, den)
              recent = (recent :+ r.v).takeRight(tail)
              seen += 1
              EwmaOut(r.key, r.event_time, r.ord, r.v, ewma, seen)
            }
            val horizon = (prior.map(_.horizonMs).toSeq ++
              rs.map(_.event_time.getTime) :+ state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeEwma(EwmaTail(recent, horizon, seen),
              stateVersion))
            state.setTimeoutTimestamp(horizon + ttlMs)
            out.iterator
          }
      }
  }

  /** Streaming CUSUM drift detection — the at-ingest twin of
    * `ops.TimeSeries.cusumAt`: Page's recursion
    * `s = max(0, s + (x − target − slack))` runs DIRECTLY in per-key
    * state (the recursion the batch operator had to closed-form away is
    * the natural streaming shape), flagging `is_drift` the moment the
    * statistic crosses `threshold`. Because the recursion and the batch
    * closed form are algebraically identical and both order on
    * (floor-seconds, ord), a drained stream equals the batch operator
    * row for row — pinned in `StatefulOpsSpec`.
    *
    * State is TWO longs per key (statistic + TTL horizon) in the
    * versioned envelope — constant regardless of stream length; keys
    * idle past `ttlMs` beyond the watermark evict.
    */
  def cusumStream(
      df: DataFrame,
      target: Long,
      slack: Long,
      threshold: Long,
      keyCol: String = "user_id",
      tsCol: String = "event_time",
      valCol: String = "v",
      ordCol: String = "ord",
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[CusumOut] = {
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val rows = df
      .filter(col(tsCol).isNotNull && col(valCol).isNotNull)
      // floor, not cast: the batch twin floors, and cast truncates
      // TOWARD ZERO for negative doubles — a silent parity break
      .select(col(keyCol).as("key"), floor(col(valCol)).cast("long").as("v"),
        col(ordCol).cast("long").as("ord"), col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[EwmaEvent]
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[VersionedState, CusumOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, it: Iterator[EwmaEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeCusum)
            // floor-seconds + ord: the ewmaStream/batch-twin ordering
            // contract (sub-second timestamps must not reorder parity)
            val rs = it.toSeq.sortBy(r =>
              (Math.floorDiv(r.event_time.getTime, 1000L), r.ord))
            var s = prior.map(_.cusum).getOrElse(0L)
            val out = rs.map { r =>
              s = math.max(0L, s + (r.v - target - slack))
              CusumOut(r.key, r.event_time, r.ord, r.v, s, s > threshold)
            }
            val horizon = (prior.map(_.horizonMs).toSeq ++
              rs.map(_.event_time.getTime) :+ state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeCusum(CusumState(s, horizon)))
            state.setTimeoutTimestamp(horizon + ttlMs)
            out.iterator
          }
      }
  }

  /** Streaming hygiene counters — the at-ingest twin of
    * `ops.TimeSeries.streamHygiene`: per key, RUNNING counts of
    * adjacent out-of-order deliveries, duplicate instants, and the
    * max silent gap, emitting the updated snapshot once per key per
    * micro-batch (the monitoring feed a stream SLO dashboard reads).
    * In-batch events fold in (epoch-us, seq) order and the last
    * (us, seq) carries in state, so a drained in-order stream matches
    * the batch operator row for row; batches that arrive out of
    * EVENT-TIME order count as out-of-order deliveries — which at
    * ingest is the truth the batch retrospective can't see.
    *
    * State is SEVEN longs per key in the versioned envelope; keys idle
    * past `ttlMs` beyond the watermark evict.
    */
  def hygieneStream(
      df: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "event_time",
      seqCol: String = "ord",
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[HygieneOut] = {
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val rows = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol)).as("us"),
        col(seqCol).cast("long").as("seq"), col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[HygieneEvent]
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[VersionedState, HygieneOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[HygieneEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeHygiene)
              .getOrElse(HygieneState(-1L, 0L, 0L, 0L, 0L, -1L, 0L))
            val rs = it.toSeq.sortBy(r => (r.us, r.seq))
            var (lastUs, lastSeq) = (prior.lastUs, prior.lastSeq)
            var (n, ooo, dup, maxGap) = (prior.n, prior.ooo, prior.dup, prior.maxGapUs)
            rs.foreach { r =>
              if (lastUs >= 0L) {
                if (r.seq < lastSeq) ooo += 1
                if (r.us == lastUs) dup += 1
                maxGap = math.max(maxGap, r.us - lastUs)
              }
              n += 1; lastUs = r.us; lastSeq = r.seq
            }
            val horizon = (prior.horizonMs +: rs.map(_.event_time.getTime) :+
              state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeHygiene(
              HygieneState(lastUs, lastSeq, n, ooo, dup, maxGap, horizon)))
            state.setTimeoutTimestamp(horizon + ttlMs)
            if (rs.isEmpty) Iterator.empty
            else Iterator(HygieneOut(key, n, ooo, dup,
              if (maxGap >= 0L) Some(maxGap / 1000000L) else None))
          }
      }
  }

  /** Streaming KMV distinct sketch — the at-ingest twin of
    * `ops.Sketches.kmvDistinct`: per key, the k smallest distinct
    * md5-family hash values fold into state as rows arrive, and the
    * updated `(n_rows, est_distinct)` snapshot emits once per key per
    * micro-batch — live per-key cardinality (distinct users per
    * source, distinct docs per shard) with O(k) state instead of a
    * distinct-set blowup. Because min-k is ORDER-INDEPENDENT (a
    * commutative idempotent fold), a drained stream equals the batch
    * sketch bit for bit regardless of batching — the strongest parity
    * class in this file (no arrival-order contract needed).
    *
    * Estimator: exact count while the key has seen fewer than k
    * distinct hashes, else `(k−1)·2³² DIV h_(k)` — identical to the
    * batch operator and its DuckDB oracle.
    */
  def kmvDistinctStream(
      df: DataFrame,
      k: Int = 256,
      keyCol: String = "key",
      itemCol: String = "item",
      tsCol: String = "event_time",
      seed: Int = 11,
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[KmvOut] = {
    require(k >= 2, "k must be at least 2")
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val rows = df
      .filter(col(keyCol).isNotNull && col(itemCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        graft.functions.Hashing.md5Hash32(seed, col(itemCol).cast("string"))
          .as("hv"),
        col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[KmvEvent]
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[VersionedState, KmvOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[KmvEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeKmv)
              .getOrElse(KmvSketch(Nil, 0L, 0L))
            val rs = it.toSeq
            var hs = prior.hs.toVector
            rs.foreach { r =>
              if (!(hs.length >= k && r.hv >= hs.last) && !hs.contains(r.hv))
                hs = ((hs :+ r.hv).sorted).take(k)
            }
            val n = prior.nRows + rs.length
            val horizon = (prior.horizonMs +: rs.map(_.event_time.getTime) :+
              state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeKmv(KmvSketch(hs.toList, n, horizon)))
            state.setTimeoutTimestamp(horizon + ttlMs)
            if (rs.isEmpty) Iterator.empty
            else {
              val est =
                if (hs.length < k) hs.length.toLong
                else ((k - 1).toLong * 4294967296L) / hs.last
              Iterator(KmvOut(key, n, est))
            }
          }
      }
  }

  /** Per-unit conversion state of [[abCellsStream]]. */
  case class AbSeen(y: Long, horizonMs: Long)

  case class AbEvent(unit: String, arm: Long, conv: Boolean,
      event_time: Timestamp)

  /** One 2×2 cell delta: fold `sum(delta)` per `(arm, y)` to get the
    * live contingency table.
    */
  case class AbDelta(arm: Long, y: Long, delta: Long)

  /** Live A/B contingency cells — the at-ingest twin of
    * `ops.Stats.abChiSquare`'s unit-grain fold: every unit is assigned
    * its md5 seed-`seed` arm on first sight and contributes ONE cell
    * `(arm, y)`; when a later event flips the unit's conversion flag
    * (`y: 0 → 1`, the batch op's `max(conv)` semantics), the operator
    * RETRACTS the old cell (−1) and asserts the new (+1). Folding
    * `sum(delta)` per cell over the drained output therefore equals
    * the batch op's `(a, b, c, d)` exactly, no matter how events are
    * batched — and feeding that fold through the SHARED
    * `Stats.abReadoutFromCells` yields the identical chi-square
    * readout ("watch the experiment converge while it runs").
    *
    * State is TWO longs per unit (the arm is recomputed from the
    * hash, never stored). Units idle past `ttlMs` beyond the watermark
    * evict — set `ttlMs` to cover the EXPERIMENT duration: a unit
    * re-appearing after eviction re-asserts its cell and the fold
    * double-counts it (the default is 30 days, not the hygiene twins'
    * hour, for exactly this reason).
    *
    * Scale: one shuffle keyed by unit — the same key grain as the
    * batch op's first aggregate; emission is ≤ 2 rows per unit per
    * flip, so the output stream is unit-bounded, not event-bounded.
    */
  def abCellsStream(
      df: DataFrame,
      unitCol: String = "unit",
      convCol: String = "conv",
      tsCol: String = "event_time",
      seed: Int = 7,
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 2592000000L
  ): Dataset[AbDelta] = {
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val rows = df
      .filter(col(unitCol).isNotNull && col(convCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(unitCol).cast("string").as("unit"),
        pmod(graft.functions.Hashing.md5Hash32(seed,
          col(unitCol).cast("string")), lit(2L)).as("arm"),
        col(convCol).cast("boolean").as("conv"),
        col(tsCol).cast("timestamp").as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[AbEvent]
    rows
      .groupByKey(_.unit)
      .flatMapGroupsWithState[VersionedState, AbDelta](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (unit: String, it: Iterator[AbEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rs = it.toSeq
            if (rs.isEmpty) Iterator.empty
            else {
            val arm = rs.head.arm
            val prior = state.getOption.map(StateCodec.decodeAbSeen)
            val newY = math.max(prior.map(_.y).getOrElse(0L),
              if (rs.exists(_.conv)) 1L else 0L)
            val horizon = (prior.map(_.horizonMs).toSeq ++
              rs.map(_.event_time.getTime) :+
              state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeAbSeen(AbSeen(newY, horizon)))
            state.setTimeoutTimestamp(horizon + ttlMs)
            prior match {
              case None => Iterator(AbDelta(arm, newY, 1L))
              case Some(p) if p.y != newY =>
                Iterator(AbDelta(arm, p.y, -1L), AbDelta(arm, newY, 1L))
              case _ => Iterator.empty
            }
            }
          }
      }
  }

  /** Late-arrival accounting — the at-ingest twin of
    * `ops.TimeSeries.lateArrivals`: per key, RUNNING counts of rows
    * arriving more than `delayMs` behind the key's event-time high
    * water mark (the rows a `delayMs` watermark would drop), plus the
    * worst observed lateness, emitted as one snapshot per key per
    * micro-batch — the feed that says whether the PIPELINE's
    * watermark delay is budgeted right BEFORE a stateful op silently
    * discards data. In-batch events fold in `seq` (arrival) order and
    * the running max carries in state, so a drained stream matches
    * the batch operator row for row (spec-pinned parity).
    *
    * The operator's own watermark is `watermarkDelay` — set it WIDER
    * than the audited `delayMs`, or the engine drops the very rows
    * being counted before they reach the accounting.
    *
    * State is FIVE longs per key in the versioned envelope; keys idle
    * past `ttlMs` beyond the watermark evict.
    */
  def lateStream(
      df: DataFrame,
      delayMs: Long,
      keyCol: String = "user_id",
      tsCol: String = "event_time",
      seqCol: String = "ord",
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[LateOut] = {
    require(delayMs >= 0L, "delayMs must be non-negative")
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val rows = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol)).as("us"),
        col(seqCol).cast("long").as("seq"), col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[HygieneEvent]
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[VersionedState, LateOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[HygieneEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeLate)
              .getOrElse(LateState(-1L, 0L, 0L, -1L, 0L))
            // seq IS the arrival order (the batch twin's contract) —
            // sorting on event time would hide the very disorder
            // this operator exists to count
            val rs = it.toSeq.sortBy(_.seq)
            var runMax = prior.runMaxUs
            var (n, nLate, maxLate) = (prior.n, prior.nLate, prior.maxLateUs)
            rs.foreach { r =>
              if (runMax >= 0L && r.us < runMax - delayMs * 1000L) {
                nLate += 1
                maxLate = math.max(maxLate, runMax - r.us)
              }
              n += 1; runMax = math.max(runMax, r.us)
            }
            val horizon = (prior.horizonMs +: rs.map(_.event_time.getTime) :+
              state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeLate(
              LateState(runMax, n, nLate, maxLate, horizon)))
            state.setTimeoutTimestamp(horizon + ttlMs)
            if (rs.isEmpty) Iterator.empty
            else Iterator(LateOut(key, n, nLate,
              if (maxLate >= 0L) Some(maxLate / 1000L) else None))
          }
      }
  }

  /** Streaming near-dup detection — the streaming analog of
    * `Dedup.minhashPairs`: each arriving document's MinHash LSH band keys
    * are checked against per-band-key state; a `BandHit(id, band,
    * first_id)` is emitted for every band the document shares with an
    * EARLIER document (min id wins, intra-batch included). A document is
    * a near-dup candidate iff it has ≥1 hit (distinct ids downstream —
    * one doc can hit on several bands).
    *
    * Scale shape: the signature is a per-row projection (the same fused
    * codegen expression as the batch path); the only shuffle is the
    * (band, bkey) key grouping, and state per key is ONE long (the
    * minimum id seen). State is evicted by event-time timeout once a
    * band key goes `ttl` past the watermark without traffic — so state
    * size tracks the ACTIVE key horizon, not stream history, and the
    * operator runs indefinitely. Deduplicate hits per id downstream for
    * a doc-level verdict (`groupBy(id).agg(min(first_id))`).
    */
  def nearDupHits(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      tsCol: String = "event_time",
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      shingleN: Int = 3,
      stateVersion: Int = 2
  ): Dataset[BandHit] = {
    require(stateVersion == 1 || stateVersion == 2,
      s"stateVersion must be 1 (rolling-upgrade compat) or 2: $stateVersion")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import docs.sparkSession.implicits._
    val (as, bs) = graft.functions.Hashing.minhashParams(numHashes)
    // signature projection with the event-time column threaded through,
    // then the SAME banding scheme as the batch path (Dedup.bandKeys) —
    // shared code, so batch diagnostics (lshBandStats) describe exactly
    // the buckets this detector forms
    // token-count pre-filter ⟺ non-empty shingle set (same rows) — the
    // shingle-emptiness formulation built the array twice per row after
    // predicate pushdown; see Dedup.minhashSignatureArray
    val withSig = docs
      // tsCol guard: the TTL horizon dereferences event_time — one NULL
      // record would NPE the query (same contract as funnelStream)
      .filter(size(graft.ext.TextOps.tokens(col(textCol))) >= shingleN &&
        col(tsCol).isNotNull)
      .select(col(idCol).as("id"), col(tsCol).as("event_time"),
        graft.ext.TextOps.shingleSet(col(textCol), shingleN).as("shs"))
      .select(col("id"), col("event_time"),
        ColumnBridge.column(graft.functions.MinhashSigExpr(
          ColumnBridge.expression(col("shs")), 0, as, bs)).as("sig"))
    val bands = graft.ext.Dedup.bandKeys(withSig, numHashes, rowsPerBand)
      .select(col("id"), col("band"), col("bkey"), col("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[BandDoc]
    bands
      .groupByKey(r => s"${r.band}:${r.bkey}")
      .flatMapGroupsWithState[VersionedState, BandHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[BandDoc], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeMinSeen)
            val rs = rows.toSeq.sortBy(_.id)
            var minSeen = prior.map(_.id).getOrElse(Long.MaxValue)
            var seen = prior.map(_.nSeen).getOrElse(0L)
            val hits = rs.flatMap { r =>
              val hit =
                if (minSeen < r.id) Some(BandHit(r.id, r.band, minSeen, seen))
                else None
              if (r.id < minSeen) minSeen = r.id
              seen += 1
              hit
            }
            // sliding TTL anchored on event time, not the watermark alone:
            // during the FIRST batch the watermark is still 0 (it advances
            // after the batch), so wm+ttl would arm a timeout in the past
            // and evict the key immediately. The horizon is MONOTONE —
            // carried in state and only ratcheted up — so an out-of-order
            // batch of older (but above-watermark) events can never pull
            // an armed timeout EARLIER and evict the key before the
            // horizon a previous batch established.
            val horizon = (prior.map(_.horizonMs).toSeq ++
              rs.map(_.event_time.getTime) :+ state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeMinSeen(
              MinSeen(minSeen, horizon, seen), stateVersion))
            state.setTimeoutTimestamp(horizon + ttlMs)
            hits.iterator
          }
      }
  }

  case class SigDoc(id: Long, txt: String, sig: String, event_time: Timestamp)
  case class SigSeen(id: Long, txt: String, horizonMs: Long)
  case class SigHit(id: Long, first_id: Long, dist: Long)

  /** Streaming edit-distance dedup at ingest — the streaming twin of
    * `Dedup.editDistancePairs`, completing the pattern [[nearDupHits]]
    * set for MinHash: each arriving document emits its FastSS deletion
    * signatures (full-text md5 + one per delete-one-token variant, the
    * same codegen generator formulation as the batch operator), keyed
    * state per signature holds the CANONICAL (lowest-id) document seen,
    * and a later arrival sharing a signature is verified in-operator
    * with exact character levenshtein before a [[SigHit]] is emitted —
    * so unlike [[nearDupHits]]' band hits (candidates), every emitted
    * hit is a CONFIRMED ≤ `maxDist` revision of the canonical.
    *
    * Semantics: verification is against the signature bucket's canonical
    * only (the keep-canonical ingest policy), not all prior arrivals —
    * every hit is therefore also a `editDistancePairs` pair, but a doc
    * within range of a NON-canonical bucket member alone goes unflagged
    * (run the batch operator for all-pairs audits). A pair sharing
    * several signatures emits one hit per shared signature (band-hit
    * convention); distinct on (id, first_id) downstream if needed.
    *
    * State: one (id, text, horizon) per live signature — the TEXT rides
    * in state for the in-operator verify, which is what bounds this to
    * FastSS's short-string contract (titles, captions, queries) on top
    * of the batch operator's O(tokens × chars) signature cost. Eviction
    * is the same monotone event-time TTL horizon as [[nearDupHits]].
    */
  def editDistHits(
      docs: DataFrame,
      maxDist: Long = 10L,
      idCol: String = "doc_id",
      textCol: String = "text",
      tsCol: String = "event_time",
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[SigHit] = {
    import org.apache.spark.sql.functions._
    import docs.sparkSession.implicits._
    // tsCol guard: the TTL horizon dereferences event_time (funnelStream
    // contract — NULL event_time rows are dropped, never NPE the query)
    val base = docs.filter(col(textCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("txt"),
        col(tsCol).as("event_time"), graft.ext.TextOps.tokens(col(textCol)).as("__toks"))
    val sigs = base
      .select(col("id"), col("txt"), col("event_time"), col("__toks"),
        explode(sequence(lit(0), size(col("__toks")))).as("i"))
      .select(col("id"), col("txt"), col("event_time"),
        when(col("i") === 0, graft.functions.Hashing.fingerprint(col("txt")))
          .otherwise(graft.functions.Hashing.fingerprint(concat_ws(" ",
            concat(slice(col("__toks"), lit(1), col("i") - 1),
              slice(col("__toks"), col("i") + 1, size(col("__toks")))))))
          .as("sig"))
      .withWatermark("event_time", watermarkDelay)
      .as[SigDoc]
    sigs
      .groupByKey(_.sig)
      .flatMapGroupsWithState[SigSeen, SigHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[SigDoc], state: GroupState[SigSeen]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rs = rows.toSeq.sortBy(_.id)
            var cur = state.getOption
            val hits = rs.flatMap { r =>
              val hit = cur match {
                case Some(s) if s.id < r.id =>
                  val d = StatefulOps.levenshtein(s.txt, r.txt)
                  if (d <= maxDist) Some(SigHit(r.id, s.id, d)) else None
                case _ => None
              }
              // duplicate skeletons of the SAME doc (repeated adjacent
              // tokens) hit the equal-id guard above, never self-flag
              if (cur.forall(_.id > r.id)) cur = Some(SigSeen(r.id, r.txt, 0L))
              hit
            }
            // same monotone event-time TTL anchor as nearDupHits
            val horizon = (state.getOption.map(_.horizonMs).toSeq ++
              rs.map(_.event_time.getTime) :+ state.getCurrentWatermarkMs()).max
            cur.foreach { c =>
              state.update(SigSeen(c.id, c.txt, horizon))
              state.setTimeoutTimestamp(horizon + ttlMs)
            }
            hits.iterator
          }
      }
  }

  case class VecDoc(id: Long, v: Array[Float], band: Int, bucket: Long,
      event_time: Timestamp)
  case class VecSeen(id: Long, v: Array[Float], horizonMs: Long)
  case class VecHit(id: Long, band: Int, first_id: Long, cos_micro: Long)

  /** Streaming embedding near-dup detection at ingest — the streaming
    * twin of `Dedup.embeddingNearDupPairs`' banded default, completing
    * the pattern [[nearDupHits]] (MinHash) and [[editDistHits]] (FastSS)
    * set: each arriving vector computes its `numBands` hyperplane
    * signatures MAP-SIDE (the identical [[graft.ext.SimSearch
    * .hyperplaneBucket]] constants as the batch path, so batch
    * diagnostics describe exactly these buckets), and per (band, bucket)
    * the state keeps ONE representative — the minimum id and its vector
    * (≈ 256 B at dim 64) — against which every later same-bucket arrival
    * is verified with the EXACT cosine (the same sequential-fold double
    * arithmetic as the batch operator, so a hit's `cos_micro` equals the
    * batch pair's `floor(cos·10⁶)` bit-for-bit). A `VecHit(id, band,
    * first_id, cos_micro)` is emitted when cos ≥ `threshold` — the
    * at-ingest canonical-dedup primitive (new doc vs the bucket's
    * canonical), deliberately NOT all-pairs: state stays O(1) per bucket
    * at any corpus size. A pair sharing several bands emits once per
    * band (the [[nearDupHits]] BandHit contract — downstream dedups).
    *
    * Same monotone event-time TTL anchor as the sibling detectors; NULL
    * vectors/event times are dropped, never NPE the query.
    */
  def embedNearDupHits(
      vecs: DataFrame,
      threshold: Double = 0.9,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      tsCol: String = "event_time",
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L,
      dim: Int = 64,
      numPlanes: Int = 6,
      numBands: Int = 4,
      seed: Long = 42L
  ): Dataset[VecHit] = {
    import org.apache.spark.sql.functions._
    import vecs.sparkSession.implicits._
    val bands = (0 until numBands).map(b =>
      graft.ext.SimSearch.hyperplaneBucket(col("v"), dim, numPlanes, seed + b))
    val base = vecs
      .filter(col(vecCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col(tsCol).as("event_time"))
      .select(col("id"), col("v"), col("event_time"),
        posexplode(array(bands: _*)).as(Seq("band", "bucket")))
      .withWatermark("event_time", watermarkDelay)
      .as[VecDoc]
    base
      .groupByKey(r => s"${r.band}:${r.bucket}")
      .flatMapGroupsWithState[VecSeen, VecHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[VecDoc], state: GroupState[VecSeen]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rs = rows.toSeq.sortBy(_.id)
            var cur = state.getOption
            val hits = rs.flatMap { r =>
              val hit = cur match {
                case Some(s) if s.id < r.id =>
                  val c = StatefulOps.cosine(s.v, r.v)
                  if (c >= threshold)
                    Some(VecHit(r.id, r.band, s.id, math.floor(c * 1e6).toLong))
                  else None
                case _ => None
              }
              if (cur.forall(_.id > r.id)) cur = Some(VecSeen(r.id, r.v, 0L))
              hit
            }
            // same monotone event-time TTL anchor as nearDupHits
            val horizon = (state.getOption.map(_.horizonMs).toSeq ++
              rs.map(_.event_time.getTime) :+ state.getCurrentWatermarkMs()).max
            cur.foreach { c =>
              state.update(VecSeen(c.id, c.v, horizon))
              state.setTimeoutTimestamp(horizon + ttlMs)
            }
            hits.iterator
          }
      }
  }

  /** One leaf (l2) sketch inside [[RollupState]]. */
  case class RollupLeaf(l2: String, hs: List[Long], nRows: Long)

  /** Per-l1 state of [[kmvRollupStream]]: every child l2's min-k sketch
    * plus the shared TTL horizon — O(|l2| · k) longs per l1 key.
    */
  case class RollupState(leaves: List[RollupLeaf], horizonMs: Long)

  case class RollupEvent(l1: String, l2: String, hv: Long, event_time: Timestamp)

  /** Hierarchy snapshot row: lvl 2 = (l1, l2) leaf, lvl 1 = l1 merged
    * over its leaves. `hs` carries the sketch itself so any consumer
    * (or the top-of-hierarchy fold) can keep merging without a rescan —
    * the batch `kmvRollup` merge-not-rescan contract at ingest.
    */
  case class KmvRollupOut(lvl: Long, l1: String, l2: Option[String],
      n_rows: Long, est_distinct: Long, hs: Seq[Long])

  private def kmvEst(hs: Seq[Long], k: Int): Long =
    if (hs.length < k) hs.length.toLong
    else ((k - 1).toLong * 4294967296L) / hs.last

  private def kmvInsert(hs0: Vector[Long], hv: Long, k: Int): Vector[Long] =
    if (hs0.length >= k && hv >= hs0.last) hs0
    else if (hs0.contains(hv)) hs0
    else ((hs0 :+ hv).sorted).take(k)

  /** Streaming KMV hierarchy rollup — the at-ingest twin of
    * `ops.Sketches.kmvRollup`: events fold into per-(l1,l2) min-k
    * sketches keyed BY l1, and each micro-batch emits the touched
    * leaves' lvl-2 snapshots plus the l1 key's lvl-1 snapshot merged ON
    * THE FLY from its child sketches (min-k of a union = min-k of the
    * merged min-k sets — the same lossless merge the batch rollup
    * uses, so a drained stream equals the batch hierarchy bit for bit
    * regardless of batching). The top (lvl-0) row is deliberately NOT
    * emitted by the operator — it would funnel every row through one
    * global key; instead the emitted lvl-1 snapshots carry their `hs`
    * sketches, and the top row is a bounded fold over |l1| k-vectors
    * downstream (the parity spec pins that fold against the batch
    * lvl-0 row).
    *
    * State: O(|l2 children| · k) longs per l1 key, versioned codec,
    * event-time TTL like every twin in this file.
    */
  def kmvRollupStream(
      df: DataFrame,
      k: Int = 64,
      l1Col: String = "l1",
      l2Col: String = "l2",
      itemCol: String = "item",
      tsCol: String = "event_time",
      seed: Int = 11,
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[KmvRollupOut] = {
    require(k >= 2, "k must be at least 2")
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val rows = df
      .filter(col(l1Col).isNotNull && col(l2Col).isNotNull &&
        col(itemCol).isNotNull && col(tsCol).isNotNull)
      .select(col(l1Col).cast("string").as("l1"),
        col(l2Col).cast("string").as("l2"),
        graft.functions.Hashing.md5Hash32(seed, col(itemCol).cast("string"))
          .as("hv"),
        col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[RollupEvent]
    rows
      .groupByKey(_.l1)
      .flatMapGroupsWithState[VersionedState, KmvRollupOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (l1: String, it: Iterator[RollupEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeRollup)
              .getOrElse(RollupState(Nil, 0L))
            val rs = it.toSeq
            var leaves = prior.leaves.map(l => l.l2 -> l).toMap
            val touched = scala.collection.mutable.LinkedHashSet[String]()
            rs.foreach { r =>
              val leaf = leaves.getOrElse(r.l2, RollupLeaf(r.l2, Nil, 0L))
              leaves += r.l2 -> RollupLeaf(r.l2,
                kmvInsert(leaf.hs.toVector, r.hv, k).toList, leaf.nRows + 1)
              touched += r.l2
            }
            val horizon = (prior.horizonMs +: rs.map(_.event_time.getTime) :+
              state.getCurrentWatermarkMs()).max
            // stable leaf order keeps the codec bytes deterministic
            val leafList = leaves.values.toList.sortBy(_.l2)
            state.update(StateCodec.encodeRollup(RollupState(leafList, horizon)))
            state.setTimeoutTimestamp(horizon + ttlMs)
            if (rs.isEmpty) Iterator.empty
            else {
              val leafOuts = touched.toList.sorted.map { l2 =>
                val l = leaves(l2)
                KmvRollupOut(2L, l1, Some(l2), l.nRows, kmvEst(l.hs, k), l.hs)
              }
              val merged = leafList.flatMap(_.hs).distinct.sorted.take(k)
              val nAll = leafList.map(_.nRows).sum
              val midOut = KmvRollupOut(1L, l1, None, nAll, kmvEst(merged, k), merged)
              (leafOuts :+ midOut).iterator
            }
          }
      }
  }

  /** Pooled value histogram of [[quantileGridStream]]: (value → count)
    * sorted ascending, plus total and TTL horizon. State is O(distinct
    * values) — the operator's contract is a BOUNDED score domain
    * (quality scores, permille ranks, clamped features), where the
    * histogram is the exact sufficient statistic for every order
    * statistic.
    */
  case class GridHist(entries: List[(Long, Long)], total: Long, horizonMs: Long)

  case class GridEvent(key: String, v: Long, event_time: Timestamp)

  /** One permille grid point snapshot; `n` is the pooled count at
    * emission, so "max n per (key, g)" is the final grid.
    */
  case class QuantileGridOut(key: String, n: Long, g: Long, norm_score: Long)

  /** Streaming pooled quantile grid — the at-ingest twin of the pooled
    * side of `ops.Stats.quantileNormalize` (exposed as
    * `Stats.pooledGrid`): scores fold into an exact per-key value
    * histogram, and each micro-batch emits the full 1001-point permille
    * grid `norm_score(g) = value at rank 1 + (N−1)·g DIV 1000` — the
    * rank-selected order statistics the batch operator broadcasts, now
    * maintained live so arriving corpora can be normalized against the
    * current pool without a rescan. The histogram is an
    * order-independent (commutative, idempotent-per-event) fold, so a
    * drained stream equals the batch grid bit for bit regardless of
    * batching — the kmv parity class.
    *
    * `keyCol` names the pooled distribution (metric/score family), NOT
    * a high-cardinality entity: each key funnels through one state row
    * by design, exactly like the batch operator's one global sort. At
    * scale, pre-aggregate events to (value, count) deltas per batch
    * upstream if per-event traffic is heavy.
    */
  def quantileGridStream(
      df: DataFrame,
      keyCol: String = "key",
      scoreCol: String = "score",
      tsCol: String = "event_time",
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[QuantileGridOut] = {
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val rows = df
      .filter(col(keyCol).isNotNull && col(scoreCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        col(scoreCol).cast("long").as("v"), col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[GridEvent]
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[VersionedState, QuantileGridOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[GridEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeGrid)
              .getOrElse(GridHist(Nil, 0L, 0L))
            val rs = it.toSeq
            val hist = scala.collection.mutable.TreeMap[Long, Long]()
            prior.entries.foreach { case (v, c) => hist(v) = c }
            rs.foreach(r => hist(r.v) = hist.getOrElse(r.v, 0L) + 1L)
            val total = prior.total + rs.length
            val horizon = (prior.horizonMs +: rs.map(_.event_time.getTime) :+
              state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeGrid(
              GridHist(hist.toList, total, horizon)))
            state.setTimeoutTimestamp(horizon + ttlMs)
            if (rs.isEmpty || total == 0L) Iterator.empty
            else {
              // value at rank rn = smallest v whose cumulative count >= rn,
              // walked once over the sorted histogram for all 1001 ranks
              val entries = hist.toArray
              val ranks = (0L to 1000L).map(g => (g, 1L + ((total - 1L) * g) / 1000L))
              var idx = 0
              var cum = entries(0)._2
              val out = ranks.map { case (g, rn) =>
                while (cum < rn && idx < entries.length - 1) {
                  idx += 1; cum += entries(idx)._2
                }
                QuantileGridOut(key, total, g, entries(idx)._1)
              }
              out.iterator
            }
          }
      }
  }

  /** One Holt–Winters snapshot row; `n_events` is the key's total
    * event count at emission, so "rows at max n_events" is the final
    * forecast block (the QuantileGridOut convention).
    */
  case class HoltWintersOut(key: String, n_events: Long, h: Int,
      n_days: Long, level_milli: Long, trend_milli: Long,
      season_milli: Long, sae_milli: Long, forecast_milli: Long)

  /** Streaming additive Holt–Winters — the at-ingest twin of
    * [[graft.ops.TimeSeries.holtWintersForecast]]: events fold into an
    * exact per-key (day → count) histogram (REUSING the GridHist state
    * + v1 codec — a day histogram IS a value histogram), and each
    * micro-batch replays the batch operator's integer milli recurrence
    * over the gap-filled span and emits the full horizon block. The
    * histogram fold is order-independent, so a drained stream equals
    * the batch forecast bit for bit REGARDLESS of batching — late or
    * reordered events simply land in their day bucket (the kmv parity
    * class; a forecaster that folded state per-batch in arrival order
    * would diverge under reordering, which is why the sufficient
    * statistic is the histogram, not the smoothing state).
    *
    * Replay cost per batch is O(day span) per key — calendar-bounded,
    * the batch operator's own array bound (spans over `maxDays` are
    * dropped, same contract). Keys shorter than one season emit
    * nothing yet (they start forecasting the batch they cross m+1
    * days, the batch drop rule live).
    */
  def holtWintersStream(
      df: DataFrame,
      keyCol: String = "key",
      tsCol: String = "event_time",
      m: Int = 7,
      horizon: Int = 7,
      alphaPpm: Long = 300000L,
      betaPpm: Long = 100000L,
      gammaPpm: Long = 200000L,
      maxDays: Int = 100000,
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[HoltWintersOut] = {
    require(m >= 2 && horizon >= 1, "m >= 2 and horizon >= 1")
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val rows = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"), lit(0L).as("v"),
        col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[GridEvent]
    val (a, b, g) = (alphaPpm, betaPpm, gammaPpm)
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[VersionedState, HoltWintersOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[GridEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeGrid)
              .getOrElse(GridHist(Nil, 0L, 0L))
            val rs = it.toSeq
            val hist = scala.collection.mutable.TreeMap[Long, Long]()
            prior.entries.foreach { case (d, c) => hist(d) = c }
            rs.foreach { r =>
              // day bucket exactly as the batch twin: floor-seconds
              // (the ewmaStream convention), then truncating DIV 86400
              val day = Math.floorDiv(r.event_time.getTime, 1000L) / 86400L
              hist(day) = hist.getOrElse(day, 0L) + 1L
            }
            val total = prior.total + rs.length
            val horizonMs = (prior.horizonMs +: rs.map(_.event_time.getTime)
              :+ state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeGrid(
              GridHist(hist.toList, total, horizonMs)))
            state.setTimeoutTimestamp(horizonMs + ttlMs)
            if (rs.isEmpty || hist.isEmpty) Iterator.empty
            else {
              val d0 = hist.firstKey; val d1 = hist.lastKey
              val span = d1 - d0 + 1
              if (span > maxDays || span <= m) Iterator.empty
              else {
                val n = span.toInt
                val ys = new Array[Long](n)
                hist.foreach { case (d, c) => ys((d - d0).toInt) = c }
                // the batch recurrence verbatim: Java / truncates toward
                // zero exactly like Spark DIV
                var l = (0 until m).map(ys(_) * 1000L).sum / m
                val s = Array.tabulate(m)(i => ys(i) * 1000L - l)
                var bb = 0L; var sae = 0L
                var t = m + 1
                while (t <= n) {
                  val y = ys(t - 1) * 1000L
                  val slot = (t - 1) % m
                  val sold = s(slot)
                  val lN = (a * (y - sold) + (1000000L - a) * (l + bb)) / 1000000L
                  val bN = (b * (lN - l) + (1000000L - b) * bb) / 1000000L
                  val sN = (g * (y - lN) + (1000000L - g) * sold) / 1000000L
                  sae += Math.abs(y - (l + bb + sold))
                  l = lN; bb = bN; s(slot) = sN
                  t += 1
                }
                (1 to horizon).iterator.map { h =>
                  val season = s((n + h - 1) % m)
                  HoltWintersOut(key, total, h, span, l, bb, season, sae,
                    l + h * bb + season)
                }
              }
            }
          }
      }
  }

  /** One ACF snapshot row per (key, lag); `n_events` is the key's total
    * event count at emission, so "rows at max n_events" is the final
    * ACF block (the HoltWintersOut convention). `acf_ppm` is None for a
    * constant series (zero variance), exactly the batch NULL.
    */
  case class AcfOut(key: String, n_events: Long, lag: Int, n_days: Long,
      acf_ppm: Option[Long])

  /** Streaming autocorrelation — the at-ingest twin of
    * [[graft.ops.TimeSeries.acfPpm]]: events fold into the exact per-key
    * (day → count) histogram (the [[holtWintersStream]] GridHist reuse —
    * the day histogram is the series' sufficient statistic), and each
    * micro-batch replays the batch operator's n-scaled centered fold
    * `r_l_ppm = (10⁶·Σ c_t·c_{t+l}) DIV (Σ c_t²)`, `c_t = n·y_t − S`,
    * over the gap-filled span and emits the full lag block. Products run
    * in BigInt — the JVM replay of the batch DECIMAL(38,0) lanes (both
    * divisions truncate toward zero), so a drained stream equals the
    * batch ACF bit for bit regardless of batching or reordering (late
    * events just land in their day bucket; the kmv parity class).
    *
    * Replay cost per batch is O(span·maxLag) per key — calendar-bounded,
    * the batch operator's own array bound; spans over `maxDays` emit
    * nothing (the batch DROP contract live).
    */
  def acfStream(
      df: DataFrame,
      keyCol: String = "key",
      tsCol: String = "event_time",
      maxLag: Int = 7,
      maxDays: Int = 100000,
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[AcfOut] = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val rows = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"), lit(0L).as("v"),
        col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[GridEvent]
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[VersionedState, AcfOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[GridEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeGrid)
              .getOrElse(GridHist(Nil, 0L, 0L))
            val rs = it.toSeq
            val hist = scala.collection.mutable.TreeMap[Long, Long]()
            prior.entries.foreach { case (d, c) => hist(d) = c }
            rs.foreach { r =>
              val day = Math.floorDiv(r.event_time.getTime, 1000L) / 86400L
              hist(day) = hist.getOrElse(day, 0L) + 1L
            }
            val total = prior.total + rs.length
            val horizonMs = (prior.horizonMs +: rs.map(_.event_time.getTime)
              :+ state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeGrid(
              GridHist(hist.toList, total, horizonMs)))
            state.setTimeoutTimestamp(horizonMs + ttlMs)
            if (rs.isEmpty || hist.isEmpty) Iterator.empty
            else {
              val d0 = hist.firstKey; val d1 = hist.lastKey
              val span = d1 - d0 + 1
              if (span > maxDays) Iterator.empty
              else {
                val n = span.toInt
                val ys = new Array[Long](n)
                hist.foreach { case (d, c) => ys((d - d0).toInt) = c }
                val s = ys.sum
                // c_t = n·y_t − S in BigInt: the DECIMAL(38,0) lane replay
                val c = ys.map(y => BigInt(n) * y - s)
                val den = c.map(x => x * x).sum
                (1 to maxLag).iterator.filter(_ < n).map { l =>
                  val num = (0 until n - l).map(i => c(i) * c(i + l)).sum
                  val ppm =
                    if (den > 0) Some(((num * 1000000) / den).toLong) else None
                  AcfOut(key, total, l, span, ppm)
                }
              }
            }
          }
      }
  }

  /** One decayed-popularity snapshot row; `n_events` marks the final
    * block (the HoltWintersOut convention).
    */
  case class DecayedPopOut(key: String, n_events: Long, last_day_age: Long,
      decayed_ppm: Long)

  /** Streaming exponentially-decayed popularity — the at-ingest twin of
    * [[graft.ops.TimeSeries.decayedPopularity]]: the same GridHist day
    * histogram, re-read each batch as
    * `Σ_d count(d) · (10⁶ DIV 2^min(age(d) DIV halfLifeDays, 19))` — the
    * batch operator's per-event bit-shift weight grouped by day.
    *
    * The batch anchor is the CORPUS max day (a one-row broadcast) —
    * global state a keyed twin cannot see — so the anchor is explicit
    * here: pass `anchorDay` (epoch days) to reproduce the batch readout
    * bit for bit (the parity pin does); leave it None for the live
    * semantics "each key anchored at its own latest day" (freshness
    * relative to the key's own activity). Ages clamp at 0 so an anchor
    * earlier than observed days (clock skew, a stale anchor) degrades
    * to weight 10⁶, never a negative shift. Keys whose day span exceeds
    * `maxDays` emit nothing — the state histogram must stay
    * calendar-bounded; the batch operator has no such bound (its
    * aggregate never materializes the span), so pre-filter ancient
    * events upstream if a key can straddle 274 years.
    */
  def decayedPopularityStream(
      df: DataFrame,
      keyCol: String = "key",
      tsCol: String = "event_time",
      halfLifeDays: Int = 7,
      anchorDay: Option[Long] = None,
      maxDays: Int = 100000,
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[DecayedPopOut] = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1: $halfLifeDays")
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val rows = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"), lit(0L).as("v"),
        col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[GridEvent]
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[VersionedState, DecayedPopOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[GridEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeGrid)
              .getOrElse(GridHist(Nil, 0L, 0L))
            val rs = it.toSeq
            val hist = scala.collection.mutable.TreeMap[Long, Long]()
            prior.entries.foreach { case (d, c) => hist(d) = c }
            rs.foreach { r =>
              val day = Math.floorDiv(r.event_time.getTime, 1000L) / 86400L
              hist(day) = hist.getOrElse(day, 0L) + 1L
            }
            val total = prior.total + rs.length
            val horizonMs = (prior.horizonMs +: rs.map(_.event_time.getTime)
              :+ state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeGrid(
              GridHist(hist.toList, total, horizonMs)))
            state.setTimeoutTimestamp(horizonMs + ttlMs)
            if (rs.isEmpty || hist.isEmpty ||
                hist.lastKey - hist.firstKey + 1 > maxDays) Iterator.empty
            else {
              val anchor = anchorDay.getOrElse(hist.lastKey)
              var decayed = 0L
              hist.foreach { case (d, cnt) =>
                val age = Math.max(anchor - d, 0L)
                val w = 1000000L / (1L << Math.min(age / halfLifeDays, 19L).toInt)
                decayed += cnt * w
              }
              Iterator.single(DecayedPopOut(key, total,
                Math.max(anchor - hist.lastKey, 0L), decayed))
            }
          }
      }
  }

  /** One Mann–Kendall snapshot row; `n_events` marks the final block
    * (the HoltWintersOut convention). `z2_signed_milli` is None when
    * the tie-corrected variance is 0 (every day equal).
    */
  case class MkOut(key: String, n_events: Long, n_days: Long, s_stat: Long,
      var18: Long, z2_signed_milli: Option[Long], significant: Boolean)

  /** Streaming Mann–Kendall — the at-ingest twin of
    * [[graft.ops.TimeSeries.mannKendall]] on the same GridHist day
    * histogram: each micro-batch replays the pairwise sign fold, the
    * tie-corrected `Var·18` and the continuity-corrected cleared z²
    * over the gap-filled span, with the (|S|−1)² products in BigInt
    * (the JVM replay of the batch DECIMAL(38,0) lanes), and emits one
    * snapshot row — the live "is this metric trending" monitor.
    * Histogram fold is order-independent → drained ≡ batch bit for bit
    * (the kmv parity class). Keys under 2 days or over `maxDays` emit
    * nothing (the batch filter/drop contract live); the O(span²) pair
    * fold is calendar-bounded, the batch operator's own cost.
    */
  def mannKendallStream(
      df: DataFrame,
      keyCol: String = "key",
      tsCol: String = "event_time",
      maxDays: Int = 100000,
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[MkOut] = {
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val rows = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"), lit(0L).as("v"),
        col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[GridEvent]
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[VersionedState, MkOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[GridEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeGrid)
              .getOrElse(GridHist(Nil, 0L, 0L))
            val rs = it.toSeq
            val hist = scala.collection.mutable.TreeMap[Long, Long]()
            prior.entries.foreach { case (d, c) => hist(d) = c }
            rs.foreach { r =>
              val day = Math.floorDiv(r.event_time.getTime, 1000L) / 86400L
              hist(day) = hist.getOrElse(day, 0L) + 1L
            }
            val total = prior.total + rs.length
            val horizonMs = (prior.horizonMs +: rs.map(_.event_time.getTime)
              :+ state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeGrid(
              GridHist(hist.toList, total, horizonMs)))
            state.setTimeoutTimestamp(horizonMs + ttlMs)
            if (rs.isEmpty || hist.isEmpty) Iterator.empty
            else {
              val span = hist.lastKey - hist.firstKey + 1
              if (span > maxDays || span < 2) Iterator.empty
              else {
                val n = span.toInt
                val d0 = hist.firstKey
                val ys = new Array[Long](n)
                hist.foreach { case (d, c) => ys((d - d0).toInt) = c }
                var s = 0L
                var i = 0
                while (i < n) {
                  var j = i + 1
                  while (j < n) {
                    s += java.lang.Long.signum(ys(j) - ys(i)); j += 1
                  }
                  i += 1
                }
                val ties = ys.groupBy(identity).values
                  .map { g => val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }
                  .sum
                val nL = n.toLong
                val var18 = nL * (nL - 1) * (2 * nL + 5) - ties
                val absS = BigInt(math.abs(s)) - 1
                val z2 =
                  if (var18 > 0)
                    Some((BigInt(java.lang.Long.signum(s))
                      * ((BigInt(18000) * absS * absS) / var18)).toLong)
                  else None
                val sig = var18 > 0 && math.abs(s) > 1 &&
                  BigInt(180000) * absS * absS > BigInt(38416) * var18
                Iterator.single(MkOut(key, total, span, s, var18, z2, sig))
              }
            }
          }
      }
  }

  /** One Croston snapshot row; `n_events` marks the final block. */
  case class CrostonOut(key: String, n_events: Long, n_days: Long,
      n_demand: Long, z_milli: Option[Long], p_milli: Option[Long],
      forecast_milli: Option[Long])

  /** Streaming Croston intermittent-demand forecast — the at-ingest
    * twin of [[graft.ops.TimeSeries.crostonForecast]] on the same
    * GridHist day histogram (filter the input stream to the demand
    * event class exactly as the batch caller does): each micro-batch
    * replays the (z, p, gap, nd) integer milli recurrence over the
    * gap-filled span — one truncating division per smoothed lane per
    * demand day, Java `/` ≡ Spark DIV on the non-negative lanes — and
    * emits one snapshot row. Drained ≡ batch bit for bit under
    * reordering (the histogram is the sufficient statistic; folding
    * smoothing state in arrival order would diverge, which is exactly
    * why the state is the histogram, not (z, p)).
    */
  def crostonStream(
      df: DataFrame,
      keyCol: String = "key",
      tsCol: String = "event_time",
      alphaPpm: Long = 200000L,
      maxDays: Int = 100000,
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600000L
  ): Dataset[CrostonOut] = {
    require(alphaPpm > 0 && alphaPpm <= 1000000L, "alpha in (0, 1e6] ppm")
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val a = alphaPpm
    val rows = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"), lit(0L).as("v"),
        col(tsCol).as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[GridEvent]
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[VersionedState, CrostonOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[GridEvent], state: GroupState[VersionedState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.map(StateCodec.decodeGrid)
              .getOrElse(GridHist(Nil, 0L, 0L))
            val rs = it.toSeq
            val hist = scala.collection.mutable.TreeMap[Long, Long]()
            prior.entries.foreach { case (d, c) => hist(d) = c }
            rs.foreach { r =>
              val day = Math.floorDiv(r.event_time.getTime, 1000L) / 86400L
              hist(day) = hist.getOrElse(day, 0L) + 1L
            }
            val total = prior.total + rs.length
            val horizonMs = (prior.horizonMs +: rs.map(_.event_time.getTime)
              :+ state.getCurrentWatermarkMs()).max
            state.update(StateCodec.encodeGrid(
              GridHist(hist.toList, total, horizonMs)))
            state.setTimeoutTimestamp(horizonMs + ttlMs)
            if (rs.isEmpty || hist.isEmpty ||
                hist.lastKey - hist.firstKey + 1 > maxDays) Iterator.empty
            else {
              val span = hist.lastKey - hist.firstKey + 1
              val n = span.toInt
              val d0 = hist.firstKey
              val ys = new Array[Long](n)
              hist.foreach { case (d, c) => ys((d - d0).toInt) = c }
              // the batch recurrence verbatim (all lanes non-negative,
              // so Java / is the same truncation as Spark DIV)
              var z = 0L; var p = 0L; var gap = 1L; var nd = 0L
              ys.foreach { y =>
                if (y > 0) {
                  z = if (nd == 0) y * 1000
                      else (a * y * 1000 + (1000000 - a) * z) / 1000000
                  p = if (nd == 0) gap * 1000
                      else (a * gap * 1000 + (1000000 - a) * p) / 1000000
                  gap = 1; nd += 1
                } else gap += 1
              }
              val zM = if (nd > 0) Some(z) else None
              val pM = if (nd > 0) Some(p) else None
              val fc = if (nd > 0 && p > 0) Some(z * 1000 / p) else None
              Iterator.single(CrostonOut(key, total, span, nd, zM, pM, fc))
            }
          }
      }
  }

  /** Sequential-fold cosine matching `VectorOps.dot / (norm·norm)`
    * term-for-term (cast each float to double, accumulate left to
    * right) — needed because the streaming verify runs on JVM arrays
    * inside the state function, and the batch parity spec pins the
    * doubles bit-for-bit.
    */
  private[streaming] def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Classic DP levenshtein, matching Spark's `levenshtein` function
    * value-for-value (the batch parity spec pins this) — needed because
    * the verify runs on JVM strings inside the state function.
    */
  private[streaming] def levenshtein(a: String, b: String): Long = {
    if (a == b) return 0L
    val (m, n) = (a.length, b.length)
    var prev = Array.tabulate(n + 1)(identity)
    val cur = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      cur(0) = i
      var j = 1
      while (j <= n) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; System.arraycopy(cur, 0, t, 0, n + 1); prev = t
      i += 1
    }
    prev(n).toLong
  }

  /** [[sessionize]] re-expressed on Spark 4's `transformWithState`
    * arbitrary-state API (`StatefulProcessor` + typed `ValueState` +
    * explicit event-time timers) — same hold-until-watermark semantics,
    * same output. The processor keeps the held-session list in one
    * `ValueState` and one registered timer at the earliest
    * `session end + gap`, re-armed as sessions merge or flush. Requires
    * the RocksDB state-store provider (a transformWithState constraint).
    */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, Telemetry, SessionOut] {
    @transient private var sessions: ValueState[SessionList] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sessions = getHandle.getValueState[SessionList](
        "sessions", Encoders.product[SessionList], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def mergeAndEmit(key: String, events: Seq[Long], wm: Long): Iterator[SessionOut] = {
      val prior = if (sessions.exists()) sessions.get().sessions else Nil
      val merged = mergeIntervals(prior, events, gapMs)
      val (safe, held) = merged.partition(s => s.last + gapMs < wm)
      if (held.isEmpty) {
        sessions.clear()
        if (armed.exists()) { getHandle.deleteTimer(armed.get()); armed.clear() }
      } else {
        sessions.update(SessionList(held))
        val t = math.max(held.map(_.last + gapMs).min, wm + 1)
        if (!armed.exists() || armed.get() != t) {
          if (armed.exists()) getHandle.deleteTimer(armed.get())
          getHandle.registerTimer(t)
          armed.update(t)
        }
      }
      safe.iterator.map(s => SessionOut(key, new Timestamp(s.start), s.count))
    }

    override def handleInputRows(key: String, rows: Iterator[Telemetry],
                                 timerValues: TimerValues): Iterator[SessionOut] =
      mergeAndEmit(key,
        rows.filter(_.event_time != null).map(_.event_time.getTime).toSeq.sorted,
        timerValues.getCurrentWatermarkInMs())

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      armed.clear() // the fired timer is consumed; mergeAndEmit re-arms if needed
      mergeAndEmit(key, Nil, timerValues.getCurrentWatermarkInMs())
    }
  }

  /** Gap-based sessionization via `transformWithState` — see
    * [[SessionProcessor]]; drained-stream output is identical to
    * [[sessionize]] (pinned by StatefulOpsSpec's parity test).
    */
  def sessionizeTws(telemetry: Dataset[Telemetry], gapMs: Long,
                    watermarkDelay: String = "5 seconds"): Dataset[SessionOut] = {
    import telemetry.sparkSession.implicits._
    telemetry
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.sensor_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
