package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.core.Telemetry

class StatefulOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("sessionize: gap closes inline, watermark timeout closes the tail session") {
    val mem = MemoryStream[Telemetry](spark)
    val query = StatefulOps.sessionize(mem.toDS(), gapMs = 30000L)
      .writeStream.format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      // session A: two events 10s apart
      mem.addData(Seq(
        Telemetry("s1", 30, ts("2024-01-01 00:00:00")),
        Telemetry("s1", 30, ts("2024-01-01 00:00:10"))))
      query.processAllAvailable()
      // 110s later: closes session A inline, opens session B
      mem.addData(Seq(Telemetry("s1", 30, ts("2024-01-01 00:02:00"))))
      query.processAllAvailable()
      // advance the watermark far past B's gap -> timeout closes B
      mem.addData(Seq(Telemetry("s2", 30, ts("2024-01-01 00:10:00"))))
      query.processAllAvailable()
      mem.addData(Seq(Telemetry("s2", 30, ts("2024-01-01 00:20:00"))))
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.table("sessions_out").as[StatefulOps.SessionOut]
      .collect().filter(_.sensor_id == "s1")
      .map(s => (s.session_start, s.n_events)).sortBy(_._1.getTime).toList
    assert(out == List(
      (ts("2024-01-01 00:00:00"), 2L),
      (ts("2024-01-01 00:02:00"), 1L)))
  }

  test("nearDupHits: later near-dups flag against the earliest doc, unrelated docs never flag") {
    val doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val far = "one two three four five six seven eight nine ten"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = mem.toDS().toDF("doc_id", "text", "event_time")
    val query = StatefulOps.nearDupHits(stream, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("neardup_hits").outputMode("append").start()
    try {
      // batch 1: originals
      mem.addData(Seq((0L, doc, ts("2024-01-01 00:00:00")), (3L, far, ts("2024-01-01 00:00:01"))))
      query.processAllAvailable()
      // batch 2: an exact copy and a near copy arrive later
      mem.addData(Seq((1L, doc, ts("2024-01-01 00:01:00")), (2L, near, ts("2024-01-01 00:01:01"))))
      query.processAllAvailable()
    } finally query.stop()

    val hits = spark.table("neardup_hits").as[StatefulOps.BandHit].collect()
    val flagged = hits.map(h => h.id -> h.first_id).distinct.groupBy(_._1)
    // doc 1 (exact copy) shares every band with doc 0
    assert(flagged(1L).forall(_._2 == 0L))
    assert(hits.count(_.id == 1L) == 4, "exact copy must hit on all 4 bands")
    // doc 2 (near copy) shares at least one band, always against doc 0
    assert(flagged(2L).nonEmpty && flagged(2L).forall(_._2 == 0L))
    // originals and the unrelated doc never flag
    assert(!flagged.contains(0L) && !flagged.contains(3L))
  }

  test("nearDupHits: intra-batch duplicates flag against the batch minimum id") {
    val doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = mem.toDS().toDF("doc_id", "text", "event_time")
    val query = StatefulOps.nearDupHits(stream, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("neardup_intra").outputMode("append").start()
    try {
      mem.addData(Seq(
        (7L, doc, ts("2024-01-01 00:00:00")),
        (5L, doc, ts("2024-01-01 00:00:01")),
        (9L, doc, ts("2024-01-01 00:00:02"))))
      query.processAllAvailable()
    } finally query.stop()
    val hits = spark.table("neardup_intra").as[StatefulOps.BandHit].collect()
    val flagged = hits.map(h => h.id -> h.first_id).distinct.sorted.toList
    // 5 is the minimum: 7 and 9 flag against it on every band; 5 never flags
    assert(flagged == List(7L -> 5L, 9L -> 5L))
    assert(hits.count(_.id == 7L) == 4 && hits.count(_.id == 9L) == 4)
    // bucket heat: processing is id-ascending, so 7 fired with 1 doc
    // already in each bucket and 9 with 2
    assert(hits.filter(_.id == 7L).forall(_.n_seen == 1L))
    assert(hits.filter(_.id == 9L).forall(_.n_seen == 2L))
  }

  test("nearDupHits: a v2 engine resumes a committed v1 checkpoint (upgrade drill, both providers)") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    val doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    for (provider <- Seq(None, Some(rocks))) {
      provider.foreach(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
      try {
        val in = Files.createTempDirectory("graft_ndh_in_")
        val out = Files.createTempDirectory("graft_ndh_out_").toString
        val chk = Files.createTempDirectory("graft_ndh_chk_").toString
        val schema = "doc_id LONG, text STRING, event_time TIMESTAMP"
        def writeBatch(name: String,
            rows: Seq[(Long, String, java.sql.Timestamp)]): Unit =
          rows.toDF("doc_id", "text", "event_time")
            .coalesce(1).write.parquet(s"$in/$name")
        def runOnce(version: Int): Unit = {
          val stream = spark.readStream.schema(schema)
            .option("latestFirst", "false").parquet(s"$in/*/")
          val query = StatefulOps.nearDupHits(stream,
              watermarkDelay = "10 minutes", stateVersion = version)
            .writeStream.format("json")
            .option("path", out).option("checkpointLocation", chk)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          query.awaitTermination(120000)
        }
        // run 1: the PREVIOUS engine (v1 state layout) sees the original
        writeBatch("b1", Seq((3L, doc, ts("2024-01-01 00:00:00"))))
        runOnce(version = 1)
        // run 2: the UPGRADED engine (v2 default) resumes that
        // checkpoint — the dedup verdict must CONTINUE (doc 9 flags
        // against the v1-era doc 3 on every band), while the widened
        // bucket-heat counter restarts from the documented v1-decode
        // default of 0
        writeBatch("b2", Seq((9L, doc, ts("2024-01-01 00:01:00"))))
        runOnce(version = 2)
        val got = spark.read
          .schema("id LONG, band INT, first_id LONG, n_seen LONG")
          .json(s"$out/*.json")
          .as[(Long, Int, Long, Long)].collect().sortBy(_._2).toList
        assert(got.map(r => (r._1, r._3)).distinct == List((9L, 3L)),
          s"provider=$provider got $got")
        assert(got.size == 4, s"provider=$provider: all 4 bands must hit")
        assert(got.forall(_._4 == 0L),
          s"provider=$provider: n_seen restarts from the v1-decode default")
      } finally if (provider.isDefined)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("nearDupHits: band state evicts after the TTL horizon — a re-arrival is fresh") {
    val doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val far = "one two three four five six seven eight nine ten"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = mem.toDS().toDF("doc_id", "text", "event_time")
    val query = StatefulOps.nearDupHits(stream,
      watermarkDelay = "1 second", ttlMs = 60000L)
      .writeStream.format("memory").queryName("neardup_ttl").outputMode("append").start()
    try {
      mem.addData(Seq((0L, doc, ts("2024-01-01 00:00:00"))))
      query.processAllAvailable()
      // push the watermark far beyond 00:00:00 + 60s -> doc 0's band keys evict
      mem.addData(Seq((3L, far, ts("2024-01-01 01:00:00"))))
      query.processAllAvailable()
      mem.addData(Seq((8L, far, ts("2024-01-01 01:00:01"))))
      query.processAllAvailable()
      // same content again, long after the horizon: no state left to hit
      mem.addData(Seq((10L, doc, ts("2024-01-01 01:00:02"))))
      query.processAllAvailable()
    } finally query.stop()
    val hits = spark.table("neardup_ttl").as[StatefulOps.BandHit].collect()
    assert(!hits.exists(_.id == 10L),
      s"doc 10 must not flag against evicted state: ${hits.toList}")
    // doc 8 (same content as 3, within horizon) still flags normally
    assert(hits.exists(h => h.id == 8L && h.first_id == 3L))
  }

  test("capPerKeyStream: accepts the first n per key across batches, flags the rest") {
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = mem.toDS().toDF("doc_id", "source", "event_time")
    val query = StatefulOps.capPerKeyStream(stream, n = 2,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("quota_out").outputMode("append").start()
    try {
      // batch 1: srcA fills its quota (intra-batch order = (ts, id)),
      // srcB uses one slot
      mem.addData(Seq(
        (11L, "srcA", ts("2024-01-01 00:00:02")), // 3rd by ts -> rejected
        (10L, "srcA", ts("2024-01-01 00:00:00")),
        (12L, "srcA", ts("2024-01-01 00:00:01")),
        (20L, "srcB", ts("2024-01-01 00:00:00"))))
      query.processAllAvailable()
      // batch 2: srcA is already full; srcB's count CONTINUES (1 + these)
      mem.addData(Seq(
        (13L, "srcA", ts("2024-01-01 00:01:00")),
        (21L, "srcB", ts("2024-01-01 00:01:00")),
        (22L, "srcB", ts("2024-01-01 00:01:01"))))
      query.processAllAvailable()
    } finally query.stop()

    val v = spark.table("quota_out").as[StatefulOps.QuotaVerdict].collect()
      .map(q => q.id -> q.accepted).toMap
    assert(v == Map(10L -> true, 12L -> true, 11L -> false, 13L -> false,
      20L -> true, 21L -> true, 22L -> false), s"got $v")
  }

  test("capPerKeyStream: single-batch drain equals the batch (ts,id) row_number prefix") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    // 60 rows over 3 sources with shuffled ids and duplicate timestamps
    val rows = (0 until 60).map { i =>
      ((i * 37 % 60).toLong, s"src${i % 3}", ts(f"2024-01-01 00:00:${i % 7}%02d"))
    }
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val query = StatefulOps.capPerKeyStream(
        mem.toDS().toDF("doc_id", "source", "event_time"), n = 5,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("quota_parity").outputMode("append").start()
    try { mem.addData(rows); query.processAllAvailable() } finally query.stop()

    val streamed = spark.table("quota_parity").as[StatefulOps.QuotaVerdict]
      .collect().filter(_.accepted).map(_.id).sorted.toList
    val batch = rows.toDF("doc_id", "source", "event_time")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("event_time"), col("doc_id"))))
      .filter(col("rk") <= 5).select("doc_id").as[Long].collect().sorted.toList
    assert(streamed == batch,
      s"drained quota must equal the batch row_number prefix: $streamed vs $batch")
  }

  test("capPerKeyStream: quota state evicts after the TTL horizon — the key starts fresh") {
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val query = StatefulOps.capPerKeyStream(
        mem.toDS().toDF("doc_id", "source", "event_time"), n = 1,
        watermarkDelay = "1 second", ttlMs = 60000L)
      .writeStream.format("memory").queryName("quota_ttl").outputMode("append").start()
    try {
      mem.addData(Seq((0L, "srcA", ts("2024-01-01 00:00:00"))))
      query.processAllAvailable()
      // advance the watermark far past 00:00:00 + 60s via another key
      mem.addData(Seq((1L, "srcB", ts("2024-01-01 01:00:00"))))
      query.processAllAvailable()
      mem.addData(Seq((2L, "srcB", ts("2024-01-01 01:00:01"))))
      query.processAllAvailable()
      // srcA's count evicted -> a late arrival gets a fresh quota
      mem.addData(Seq((3L, "srcA", ts("2024-01-01 01:00:02"))))
      query.processAllAvailable()
    } finally query.stop()
    val v = spark.table("quota_ttl").as[StatefulOps.QuotaVerdict].collect()
      .map(q => q.id -> q.accepted).toMap
    assert(v(0L) && v(3L), s"fresh quota after eviction: $v")
    assert(v(1L) && !v(2L), "srcB within horizon keeps counting")
  }

  test("capPerKeyStream: an out-of-order older batch cannot pull the TTL horizon earlier") {
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val query = StatefulOps.capPerKeyStream(
        mem.toDS().toDF("doc_id", "source", "event_time"), n = 1,
        watermarkDelay = "10 minutes", ttlMs = 60000L)
      .writeStream.format("memory").queryName("quota_mono").outputMode("append").start()
    try {
      // horizon for srcA: 10:00:00 -> timeout armed at 10:01:00
      mem.addData(Seq((0L, "srcA", ts("2024-01-01 10:00:00"))))
      query.processAllAvailable()
      // OLDER but above-watermark srcA event: a non-monotone anchor would
      // rewrite the timeout to 09:56:00 — before the established horizon
      mem.addData(Seq((1L, "srcA", ts("2024-01-01 09:55:00"))))
      query.processAllAvailable()
      // advance the watermark to 09:57/09:58 via srcB — past the buggy
      // 09:56:00 anchor but before the true 10:01:00 horizon; srcA gets
      // no data in these batches, which is when an early timeout fires
      mem.addData(Seq((2L, "srcB", ts("2024-01-01 10:07:00"))))
      query.processAllAvailable()
      mem.addData(Seq((3L, "srcB", ts("2024-01-01 10:08:00"))))
      query.processAllAvailable()
      // srcA must still be at quota — a fresh acceptance here means the
      // state evicted before its horizon
      mem.addData(Seq((4L, "srcA", ts("2024-01-01 09:59:30"))))
      query.processAllAvailable()
    } finally query.stop()
    val v = spark.table("quota_mono").as[StatefulOps.QuotaVerdict].collect()
      .map(q => q.id -> q.accepted).toMap
    assert(v == Map(0L -> true, 1L -> false, 2L -> true, 3L -> false, 4L -> false),
      s"got $v")
  }

  test("sessionize: out-of-order event above the watermark extends the session start backward") {
    val mem = MemoryStream[Telemetry](spark)
    // long watermark delay so the out-of-order event is NOT late
    val query = StatefulOps.sessionize(mem.toDS(), gapMs = 30000L,
      watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sessions_ooo").outputMode("append").start()
    try {
      mem.addData(Seq(Telemetry("s1", 30, ts("2024-01-01 00:01:00"))))
      query.processAllAvailable()
      // arrives in a later batch with t 20s BEFORE the session start
      mem.addData(Seq(Telemetry("s1", 30, ts("2024-01-01 00:00:40"))))
      query.processAllAvailable()
      mem.addData(Seq(Telemetry("s1", 30, ts("2024-01-01 00:05:00"))))
      query.processAllAvailable()
      // sessions are held until the watermark passes end+gap — advance it
      // (wm during the last batch: 00:20:00 - 10 min = 00:10:00)
      mem.addData(Seq(Telemetry("s1", 30, ts("2024-01-01 00:20:00"))))
      query.processAllAvailable()
      mem.addData(Seq(Telemetry("s1", 30, ts("2024-01-01 00:40:00"))))
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.table("sessions_ooo").as[StatefulOps.SessionOut]
      .collect().map(s => (s.session_start, s.n_events))
      .filter(_._1.getTime < ts("2024-01-01 00:10:00").getTime)
      .sortBy(_._1.getTime).toList
    // session_start moved backward to 00:00:40; 00:05:00 closed by gap
    assert(out == List(
      (ts("2024-01-01 00:00:40"), 2L),
      (ts("2024-01-01 00:05:00"), 1L)))
  }

  test("sessionize: out-of-order event bridges two HELD sessions into one (no overlapping emission)") {
    val mem = MemoryStream[Telemetry](spark)
    val query = StatefulOps.sessionize(mem.toDS(), gapMs = 30000L,
      watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sessions_bridge").outputMode("append").start()
    try {
      mem.addData(Seq(Telemetry("s1", 30, ts("2024-01-01 00:00:00"))))
      query.processAllAvailable()
      // 60s later: > gap, so this LOOKS like a second session — but both
      // must be held (not emitted) while the watermark still admits events
      mem.addData(Seq(Telemetry("s1", 30, ts("2024-01-01 00:01:00"))))
      query.processAllAvailable()
      // the bridge: lands exactly between, within gap of both → one session
      mem.addData(Seq(Telemetry("s1", 30, ts("2024-01-01 00:00:30"))))
      query.processAllAvailable()
      // advance the watermark to flush (00:20:00 - 10 min = 00:10:00)
      mem.addData(Seq(Telemetry("s1", 30, ts("2024-01-01 00:20:00"))))
      query.processAllAvailable()
      mem.addData(Seq(Telemetry("s1", 30, ts("2024-01-01 00:40:00"))))
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.table("sessions_bridge").as[StatefulOps.SessionOut]
      .collect().map(s => (s.session_start, s.n_events))
      .filter(_._1.getTime < ts("2024-01-01 00:10:00").getTime).toList
    // ONE merged session of 3 events — an eager-close implementation would
    // have emitted (00:00:00) early and then a second overlapping row
    assert(out == List((ts("2024-01-01 00:00:00"), 3L)))
  }

  test("sessionizeTws (transformWithState) matches sessionize on the same stream") {
    // transformWithState requires the RocksDB state-store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batches = Seq(
        Seq(Telemetry("s1", 30, ts("2024-01-01 00:00:00")),
          Telemetry("s1", 30, ts("2024-01-01 00:00:10")),
          Telemetry("s2", 30, ts("2024-01-01 00:00:05"))),
        Seq(Telemetry("s1", 30, ts("2024-01-01 00:02:00"))), // closes s1's first session
        // out-of-order but above the watermark (00:01:55): extends backward
        Seq(Telemetry("s1", 30, ts("2024-01-01 00:01:58"))),
        Seq(Telemetry("s2", 30, ts("2024-01-01 00:10:00"))),
        Seq(Telemetry("s1", 30, ts("2024-01-01 00:20:00")),
          Telemetry("s2", 30, ts("2024-01-01 00:20:00"))))

      def run(name: String,
              f: org.apache.spark.sql.Dataset[Telemetry] => org.apache.spark.sql.Dataset[StatefulOps.SessionOut]): Set[(String, java.sql.Timestamp, Long)] = {
        val mem = MemoryStream[Telemetry](spark)
        val query = f(mem.toDS()).writeStream.format("memory")
          .queryName(name).outputMode("append").start()
        try {
          batches.foreach { b => mem.addData(b); query.processAllAvailable() }
        } finally query.stop()
        spark.table(name).as[StatefulOps.SessionOut]
          .collect().map(s => (s.sensor_id, s.session_start, s.n_events)).toSet
      }

      val viaFmgws = run("p_fmgws", ds => StatefulOps.sessionize(ds, gapMs = 30000L))
      val viaTws = run("p_tws", ds => StatefulOps.sessionizeTws(ds, gapMs = 30000L))
      assert(viaTws == viaFmgws,
        s"transformWithState sessionizer diverged:\n tws=$viaTws\n fmgws=$viaFmgws")
      // and the merged-backward session actually appears
      assert(viaFmgws.contains(("s1", ts("2024-01-01 00:01:58"), 2L)))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("sessionizeTws recovers held-session state across query restarts (RocksDB checkpoint)") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = Files.createTempDirectory("graft_tws_in_")
    val out = Files.createTempDirectory("graft_tws_out_").toString
    val chk = Files.createTempDirectory("graft_tws_chk_").toString
    val schema = Seq.empty[Telemetry].toDS().schema
    try {
      def writeBatch(name: String, rows: Seq[Telemetry]): Unit =
        rows.toDS().coalesce(1).write.parquet(s"$in/$name")

      def runOnce(): Unit = {
        val stream = spark.readStream.schema(schema).option("latestFirst", "false")
          .parquet(s"$in/*/")
        val query = StatefulOps.sessionizeTws(stream.as[Telemetry], gapMs = 30000L)
          .writeStream.format("json")
          .option("path", out).option("checkpointLocation", chk)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        query.awaitTermination(120000)
      }

      // run 1: open a session for s1 — held in state (watermark low)
      writeBatch("b1", Seq(
        Telemetry("s1", 30, ts("2024-01-01 00:00:00")),
        Telemetry("s1", 30, ts("2024-01-01 00:00:10"))))
      runOnce()
      // run 2 (restart from checkpoint): extend the SAME session — only
      // possible if the held state survived the restart — then advance
      // the watermark far enough to flush it
      writeBatch("b2", Seq(Telemetry("s1", 30, ts("2024-01-01 00:00:20"))))
      runOnce()
      writeBatch("b3", Seq(
        Telemetry("s2", 30, ts("2024-01-01 00:05:00")),
        Telemetry("s2", 30, ts("2024-01-01 00:10:00"))))
      runOnce()

      val sessions = spark.read
        .schema("sensor_id STRING, session_start TIMESTAMP, n_events LONG")
        .json(s"$out/*.json")
        .as[(String, java.sql.Timestamp, Long)].collect()
        .filter(_._1 == "s1").toList
      // ONE session of 3 events: the restart neither dropped the held
      // state (would give n_events=1 for b2's event) nor re-emitted
      assert(sessions == List(("s1", ts("2024-01-01 00:00:00"), 3L)),
        s"got $sessions")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("StateCodec: v1 byte layouts are pinned; unknown versions fail with the runbook") {
    import StatefulOps._
    // GOLDEN BYTES — these pin what checkpoints physically hold; a codec
    // refactor that changes them breaks existing checkpoints and must
    // instead add a NEW version arm
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    // MinSeen v2 (current): [id][horizonMs][nSeen]
    val ms = StateCodec.encodeMinSeen(MinSeen(7L, 0x11223344L, 5L))
    assert(ms.version == 2 && hex(ms.payload) ==
      "0000000000000007" + "0000000011223344" + "0000000000000005")
    assert(StateCodec.decodeMinSeen(ms) == MinSeen(7L, 0x11223344L, 5L))
    // MinSeen v1 GOLDEN BYTES still decode (nSeen defaults to 0 — the
    // field predates that layout), and the rolling-upgrade encoder
    // still WRITES them byte-identically
    val msV1 = StateCodec.encodeMinSeen(MinSeen(7L, 0x11223344L, 5L), version = 1)
    assert(msV1.version == 1 && hex(msV1.payload) ==
      "0000000000000007" + "0000000011223344")
    assert(StateCodec.decodeMinSeen(msV1) == MinSeen(7L, 0x11223344L, 0L))
    // a v1-sized payload under a v2 tag is the runbook corrupt-state
    // failure, never an underflow
    assertThrows[IllegalStateException](
      StateCodec.decodeMinSeen(VersionedState(2, msV1.payload)))

    val qc = StateCodec.encodeQuota(QuotaCount(3L, 256L))
    assert(qc.version == 1 && hex(qc.payload) ==
      "0000000000000003" + "0000000000000100")
    assert(StateCodec.decodeQuota(qc) == QuotaCount(3L, 256L))

    val ft = StateCodec.encodeFunnel(FunnelTimes(List(1L, -1L), 512L))
    assert(ft.version == 1 && hex(ft.payload) ==
      "00000002" + "0000000000000001" + "ffffffffffffffff" + "0000000000000200")
    assert(StateCodec.decodeFunnel(ft) == FunnelTimes(List(1L, -1L), 512L))

    // a NEWER version than this engine knows: loud failure + runbook,
    // never fabricated state
    val future = VersionedState(99, Array[Byte](1, 2, 3))
    Seq[VersionedState => Any](
      StateCodec.decodeMinSeen _, StateCodec.decodeQuota _, StateCodec.decodeFunnel _)
      .foreach { dec =>
        val e = intercept[IllegalStateException](dec(future))
        assert(e.getMessage.contains("FRESH checkpoint"), e.getMessage)
      }

    // a KNOWN version with corrupt bytes: still the runbook failure,
    // never a raw BufferUnderflowException (or a huge-count allocation)
    val truncated = VersionedState(1, Array[Byte](1, 2, 3))
    val hugeCount = VersionedState(1, {
      val b = java.nio.ByteBuffer.allocate(12)
      b.putInt(Int.MaxValue).putLong(7L); b.array()
    })
    Seq[VersionedState => Any](
      StateCodec.decodeMinSeen _, StateCodec.decodeQuota _, StateCodec.decodeFunnel _)
      .foreach { dec =>
        val e = intercept[IllegalStateException](dec(truncated))
        assert(e.getMessage.contains("corrupt checkpoint state"), e.getMessage)
      }
    val e2 = intercept[IllegalStateException](StateCodec.decodeFunnel(hugeCount))
    assert(e2.getMessage.contains("corrupt checkpoint state"), e2.getMessage)
  }

  test("capPerKeyStream: quota state survives a query restart (envelope checkpoint schema)") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    val in = Files.createTempDirectory("graft_quota_in_")
    val out = Files.createTempDirectory("graft_quota_out_").toString
    val chk = Files.createTempDirectory("graft_quota_chk_").toString
    val schema = "doc_id LONG, source STRING, event_time TIMESTAMP"
    def writeBatch(name: String, rows: Seq[(Long, String, java.sql.Timestamp)]): Unit =
      rows.toDF("doc_id", "source", "event_time").coalesce(1).write.parquet(s"$in/$name")
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).option("latestFirst", "false")
        .parquet(s"$in/*/")
      val query = StatefulOps.capPerKeyStream(stream, n = 2, watermarkDelay = "10 minutes")
        .writeStream.format("json")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination(120000)
    }
    // run 1: srcA uses 1 of its 2 slots
    writeBatch("b1", Seq((10L, "srcA", ts("2024-01-01 00:00:00"))))
    runOnce()
    // run 2 (restart from checkpoint): the count must CONTINUE at 1 —
    // 11 takes the last slot, 12 is rejected. A dropped/rejected state
    // schema would either fail the restart or re-grant a fresh quota.
    writeBatch("b2", Seq(
      (11L, "srcA", ts("2024-01-01 00:01:00")),
      (12L, "srcA", ts("2024-01-01 00:01:01"))))
    runOnce()
    val verdicts = spark.read.schema("id LONG, key STRING, accepted BOOLEAN")
      .json(s"$out/*.json").as[(Long, String, Boolean)].collect()
      .map(v => v._1 -> v._3).toMap
    assert(verdicts == Map(10L -> true, 11L -> true, 12L -> false), s"got $verdicts")
  }

  test("dedupWithinWatermark drops duplicate keys inside the horizon") {
    val mem = MemoryStream[Telemetry](spark)
    val deduped = StatefulOps.dedupWithinWatermark(
      mem.toDF().withWatermark("event_time", "10 seconds"), Seq("sensor_id"))
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData(Seq(
        Telemetry("s1", 30, ts("2024-01-01 00:00:00")),
        Telemetry("s1", 31, ts("2024-01-01 00:00:01")),
        Telemetry("s2", 32, ts("2024-01-01 00:00:02"))))
      query.processAllAvailable()
    } finally query.stop()
    assert(spark.table("dedup_out").count() == 2)
  }

  test("editDistHits: verified revisions flag cross-batch, shared-sig-but-far docs rejected") {
    val doc = "the quick brown fox jumps over the dog"
    val oneSub = "the quick brown cat jumps over the dog"          // dist 3
    val twoEdits = "a quick green fox jumps over the dog"           // 2 token edits
    // shares the delete-second-token skeleton with `skelMate` but the
    // differing tokens are long -> candidate that FAILS the verify
    val skelBase = "anchor aaaaaaaaaaaaaaaaaaaa tail piece here"
    val skelMate = "anchor bbbbbbbbbbbbbbbbbbbb tail piece here"    // dist 20
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = mem.toDS().toDF("doc_id", "text", "event_time")
    val query = StatefulOps.editDistHits(stream, maxDist = 10L,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("editdist_hits").outputMode("append").start()
    try {
      mem.addData(Seq((0L, doc, ts("2024-01-01 00:00:00")),
        (5L, skelBase, ts("2024-01-01 00:00:01"))))
      query.processAllAvailable()
      mem.addData(Seq(
        (1L, oneSub, ts("2024-01-01 00:01:00")),
        (2L, doc, ts("2024-01-01 00:01:01")),      // exact copy
        (3L, twoEdits, ts("2024-01-01 00:01:02")), // outside 1-edit recall
        (6L, skelMate, ts("2024-01-01 00:01:03"))))// candidate, dist 20 > 10
      query.processAllAvailable()
    } finally query.stop()
    val hits = spark.table("editdist_hits").as[StatefulOps.SigHit].collect()
    val byId = hits.map(h => h.id -> (h.first_id, h.dist)).distinct.groupBy(_._1)
    assert(byId(1L).toSet == Set(1L -> (0L, 3L)), s"one-sub revision: ${byId.get(1L)}")
    // the exact copy shares EVERY signature -> one hit per signature, dist 0
    assert(byId(2L).toSet == Set(2L -> (0L, 0L)))
    assert(hits.count(_.id == 2L) == doc.split(" ").length + 1)
    // two-token edits share no deletion skeleton with doc 0
    assert(!byId.contains(3L), s"outside the 1-edit contract: ${byId.get(3L)}")
    // shared-skeleton candidate fails the in-operator levenshtein verify
    assert(!byId.contains(6L), s"verify must reject dist-20: ${byId.get(6L)}")
    assert(!byId.contains(0L) && !byId.contains(5L))
  }

  test("editDistHits: single-batch hits are a subset of the batch editDistancePairs") {
    val docs = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta gamma delta"),
      (12L, "alpha beta gamma zeta"),
      (13L, "totally different words here"),
      (14L, "alpha beta gamma delta extra"))
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = mem.toDS().toDF("doc_id", "text", "event_time")
    val query = StatefulOps.editDistHits(stream, maxDist = 10L,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("editdist_parity").outputMode("append").start()
    try {
      mem.addData(docs.map { case (i, t) => (i, t, ts("2024-01-01 00:00:00")) })
      query.processAllAvailable()
    } finally query.stop()
    val streamHits = spark.table("editdist_parity").as[StatefulOps.SigHit]
      .collect().map(h => (h.first_id, h.id, h.dist)).distinct.toSet
    val batchPairs = graft.ext.Dedup.editDistancePairs(
        docs.toDF("doc_id", "text"), maxDist = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamHits.subsetOf(batchPairs),
      s"every verified hit must be a batch pair: ${streamHits -- batchPairs}")
    // the canonical-vs-all policy still finds each doc's dup of record
    assert(streamHits.contains((10L, 11L, 0L)) && streamHits.contains((10L, 12L, 2L)))
  }

  test("editDistHits JVM levenshtein matches Spark's function") {
    val cases = Seq(("", ""), ("a", ""), ("", "abc"), ("kitten", "sitting"),
      ("gamma", "delta"), ("the quick brown fox", "the quick brown cat"),
      ("abcabc", "cbacba"))
    val fromSpark = cases.toDF("a", "b")
      .select(org.apache.spark.sql.functions.levenshtein(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).cast("long"))
      .as[Long].collect().toSeq
    val fromJvm = cases.map { case (a, b) => StatefulOps.levenshtein(a, b) }
    assert(fromJvm == fromSpark)
  }

  test("funnelStream: stages advance in order across batches; out-of-order pre-stage events ignored") {
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val query = StatefulOps.funnelStream(
        mem.toDS().toDF("user_id", "event_type", "event_time"),
        Seq("view", "click", "purchase"), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("funnel_prog").outputMode("append").start()
    try {
      // u1: click BEFORE any view — must not open stage 2 later either
      // (its ts is not after the view)
      mem.addData(Seq(
        (1L, "click", ts("2024-01-01 00:00:00")),
        (1L, "view", ts("2024-01-01 00:01:00"))))
      query.processAllAvailable()
      mem.addData(Seq(
        (1L, "click", ts("2024-01-01 00:02:00")),
        (1L, "purchase", ts("2024-01-01 00:03:00"))))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("funnel_prog").as[StatefulOps.FunnelProgress]
      .collect().sortBy(_.stage).toList
    assert(got.map(p => (p.stage, p.stage_time)) == List(
      (1L, ts("2024-01-01 00:01:00")),
      (2L, ts("2024-01-01 00:02:00")),
      (3L, ts("2024-01-01 00:03:00"))))
  }

  test("funnelStream: single-batch drain matches Behavior.funnel depth and times") {
    import org.apache.spark.sql.functions.{col, max}
    val stages = Seq("view", "click", "purchase")
    // deterministic scrambled event soup over 8 users
    val rows = (0 until 120).map { i =>
      val u = (i * 31 % 8).toLong
      val et = Seq("view", "click", "purchase", "error")(i * 17 % 4)
      (u, et, ts(f"2024-01-01 00:${i * 13 % 60}%02d:${i * 7 % 60}%02d"))
    }
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val query = StatefulOps.funnelStream(
        mem.toDS().toDF("user_id", "event_type", "event_time"),
        stages, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("funnel_parity").outputMode("append").start()
    try { mem.addData(rows); query.processAllAvailable() } finally query.stop()

    val streamed = spark.table("funnel_parity")
      .groupBy("user").agg(max("stage").as("depth"))
      .as[(Long, Long)].collect().toMap
    val batch = graft.ops.Behavior.funnel(
        rows.toDF("user_id", "event_type", "event_time"),
        col("user_id"), col("event_time"), col("event_type"), stages)
      .select("user", "depth").as[(Long, Long)].collect().toMap
    assert(streamed == batch,
      s"drained funnel depths must equal batch: $streamed vs $batch")
    // stage TIMES agree too, not just depths
    val streamedTimes = spark.table("funnel_parity")
      .as[StatefulOps.FunnelProgress].collect()
      .map(p => (p.user, p.stage) -> p.stage_time).toMap
    val batchTimes = graft.ops.Behavior.funnel(
        rows.toDF("user_id", "event_type", "event_time"),
        col("user_id"), col("event_time"), col("event_type"), stages)
      .collect().flatMap { r =>
        stages.indices.flatMap { i =>
          Option(r.getTimestamp(r.fieldIndex(s"t${i + 1}")))
            .map(t => (r.getLong(r.fieldIndex("user")), i + 1L) -> t)
        }
      }.toMap
    assert(streamedTimes == batchTimes)
  }

  test("ewmaStream: single-batch drain matches TimeSeries.ewmaTrailing row for row") {
    import org.apache.spark.sql.functions.col
    // scrambled soup over 5 keys with duplicate timestamps (ord breaks ties)
    val rows = (0 until 80).map { i =>
      ((i * 31 % 5).toLong, ((i * 17 % 37) - 7).toLong, i.toLong,
        ts(f"2024-01-01 00:${i * 13 % 60}%02d:${i * 7 % 60}%02d"))
    }
    val mem = MemoryStream[(Long, Long, Long, java.sql.Timestamp)](spark)
    val query = StatefulOps.ewmaStream(
        mem.toDS().toDF("user_id", "v", "ord", "event_time"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("ewma_parity").outputMode("append").start()
    try { mem.addData(rows); query.processAllAvailable() } finally query.stop()
    val streamed = spark.table("ewma_parity").as[StatefulOps.EwmaOut]
      .collect().map(o => (o.key, o.event_time.getTime / 1000, o.ord) -> o.ewma).toMap
    val batch = graft.ops.TimeSeries.ewmaTrailing(
        rows.toDF("user_id", "v", "ord", "event_time"),
        col("user_id"), org.apache.spark.sql.functions.unix_timestamp(col("event_time")),
        col("v"), col("ord"))
      .select("key", "t", "ord", "ewma")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(streamed == batch,
      s"drained stream must equal the batch EWMA (${streamed.size} vs ${batch.size} rows)")
  }

  test("cusumStream: single-batch drain matches TimeSeries.cusumAt row for row") {
    import org.apache.spark.sql.functions.col
    // scrambled soup over 3 keys, duplicate timestamps, negative values
    val rows = (0 until 60).map { i =>
      ((i % 3).toLong, ((i * 23 % 41) - 5).toLong, i.toLong,
        ts(f"2024-01-01 00:${i * 11 % 60}%02d:${i * 5 % 60}%02d"))
    }
    val mem = MemoryStream[(Long, Long, Long, java.sql.Timestamp)](spark)
    val query = StatefulOps.cusumStream(
        mem.toDS().toDF("user_id", "v", "ord", "event_time"),
        target = 8L, slack = 2L, threshold = 30L,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("cusum_parity").outputMode("append").start()
    try { mem.addData(rows); query.processAllAvailable() } finally query.stop()
    val streamed = spark.table("cusum_parity").as[StatefulOps.CusumOut]
      .collect()
      .map(o => (o.key, o.event_time.getTime / 1000, o.ord) -> (o.cusum, o.is_drift))
      .toMap
    val batch = graft.ops.TimeSeries.cusumAt(
        rows.toDF("user_id", "v", "ord", "event_time"),
        col("user_id"), col("event_time"), col("v"), col("ord"),
        target = 8L, slack = 2L, threshold = 30L)
      .select("key", "ts_sec", "seq", "cusum", "is_drift")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2, r._3) -> (r._4, r._5)).toMap
    assert(streamed == batch,
      s"drained stream must equal batch CUSUM (${streamed.size} vs ${batch.size})")
    assert(streamed.values.exists(_._2), "fixture must trip at least one alarm")
  }

  test("cusumStream: state survives across batches (recursion continues, not restarts)") {
    val mem = MemoryStream[(Long, Long, Long, java.sql.Timestamp)](spark)
    val query = StatefulOps.cusumStream(
        mem.toDS().toDF("user_id", "v", "ord", "event_time"),
        target = 0L, slack = 0L, threshold = 100L,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("cusum_batches").outputMode("append").start()
    try {
      mem.addData(Seq((1L, 40L, 0L, ts("2024-01-01 00:00:01"))))
      query.processAllAvailable()
      mem.addData(Seq((1L, 40L, 1L, ts("2024-01-01 00:00:02"))))
      query.processAllAvailable()
      mem.addData(Seq((1L, 40L, 2L, ts("2024-01-01 00:00:03"))))
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("cusum_batches").as[StatefulOps.CusumOut]
      .collect().sortBy(_.ord).map(o => (o.cusum, o.is_drift)).toList
    assert(out == List((40L, false), (80L, false), (120L, true)), s"got $out")
  }

  test("hygieneStream: single-batch drain matches TimeSeries.streamHygiene row for row") {
    import org.apache.spark.sql.functions.col
    // scrambled soup: duplicate instants, seq inversions, gaps, 3 keys
    // period-30 clock with 60 rows: i and i+30 share key AND instant,
    // so duplicate instants are guaranteed; seq (i*37 % 53) scrambles
    val rows = (0 until 60).map { i =>
      ((i % 3).toLong, ((i * 37) % 53).toLong,
        ts(f"2024-01-01 00:${(i * 11) % 30}%02d:${(i * 7) % 30}%02d"))
    }
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val query = StatefulOps.hygieneStream(
        mem.toDS().toDF("user_id", "ord", "event_time"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("hyg_parity")
      .outputMode("append").start()
    try { mem.addData(rows); query.processAllAvailable() } finally query.stop()
    val streamed = spark.table("hyg_parity").as[StatefulOps.HygieneOut]
      .collect()
      .map(o => o.key -> ((o.n_events, o.n_ooo_adj, o.n_dup_ts,
        o.max_gap_sec.getOrElse(-1L)))).toMap
    val batch = graft.ops.TimeSeries.streamHygiene(
        rows.toDF("user_id", "ord", "event_time"),
        col("user_id"), col("event_time"), col("ord"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(streamed == batch,
      s"drained stream must equal the batch audit: $streamed vs $batch")
    assert(batch.values.exists(_._2 > 0), "fixture must contain an inversion")
    assert(batch.values.exists(_._3 > 0), "fixture must contain a dup instant")
  }

  test("hygieneStream: counters carry across batches") {
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val query = StatefulOps.hygieneStream(
        mem.toDS().toDF("user_id", "ord", "event_time"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("hyg_batches")
      .outputMode("append").start()
    try {
      mem.addData(Seq((1L, 5L, ts("2024-01-01 00:00:01"))))
      query.processAllAvailable()
      // same instant, lower seq: one dup AND one inversion vs carried state
      mem.addData(Seq((1L, 3L, ts("2024-01-01 00:00:01"))))
      query.processAllAvailable()
      mem.addData(Seq((1L, 9L, ts("2024-01-01 00:01:01")))) // 60s gap
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("hyg_batches").as[StatefulOps.HygieneOut]
      .collect().sortBy(_.n_events)
      .map(o => (o.n_events, o.n_ooo_adj, o.n_dup_ts, o.max_gap_sec)).toList
    assert(out == List((1L, 0L, 0L, None), (2L, 1L, 1L, Some(0L)),
      (3L, 1L, 1L, Some(60L))), s"got $out")
  }

  test("lateStream: single-batch drain matches TimeSeries.lateArrivals row for row") {
    import org.apache.spark.sql.functions.col
    // arrival order = seq; event times jump around so some rows fall
    // >5s behind the running max (late) and some are merely out of
    // order but within the budget (not late)
    val rows = Seq(
      (1L, 0L, ts("2024-01-01 00:00:10")),
      (1L, 1L, ts("2024-01-01 00:00:07")), // 3s behind: not late
      (1L, 2L, ts("2024-01-01 00:00:30")),
      (1L, 3L, ts("2024-01-01 00:00:02")), // 28s behind: late
      (1L, 4L, ts("2024-01-01 00:00:21")), // 9s behind: late
      (2L, 5L, ts("2024-01-01 00:00:01")),
      (2L, 6L, ts("2024-01-01 00:00:02"))) // in order: clean key
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val query = StatefulOps.lateStream(
        mem.toDS().toDF("user_id", "ord", "event_time"),
        delayMs = 5000L, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("late_parity")
      .outputMode("append").start()
    try { mem.addData(rows); query.processAllAvailable() } finally query.stop()
    val streamed = spark.table("late_parity").as[StatefulOps.LateOut]
      .collect()
      .map(o => o.key -> ((o.n_events, o.n_late, o.max_late_ms.getOrElse(-1L))))
      .toMap
    val batch = graft.ops.TimeSeries.lateArrivals(
        rows.toDF("user_id", "ord", "event_time"),
        col("user_id"), col("event_time"), col("ord"), delayMs = 5000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(streamed == batch,
      s"drained stream must equal the batch audit: $streamed vs $batch")
    assert(batch(1L) == ((5L, 2L, 28000L)), s"expected 2 late on key 1: $batch")
    assert(batch(2L) == ((2L, 0L, -1L)), s"clean key must report none: $batch")
  }

  test("lateStream: running max and counters carry across batches") {
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val query = StatefulOps.lateStream(
        mem.toDS().toDF("user_id", "ord", "event_time"),
        delayMs = 5000L, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("late_batches")
      .outputMode("append").start()
    try {
      mem.addData(Seq((1L, 0L, ts("2024-01-01 00:01:00"))))
      query.processAllAvailable()
      // 50s behind the CARRIED high water mark -> late across batches
      mem.addData(Seq((1L, 1L, ts("2024-01-01 00:00:10"))))
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("late_batches").as[StatefulOps.LateOut]
      .collect().sortBy(_.n_events)
      .map(o => (o.n_events, o.n_late, o.max_late_ms)).toList
    assert(out == List((1L, 0L, None), (2L, 1L, Some(50000L))), s"got $out")
  }

  test("abCellsStream: folded cell deltas equal batch abChiSquare cells across batches") {
    import org.apache.spark.sql.functions._
    // 40 units; u0..u9 convert in batch 1; u10..u19 convert ONLY in
    // batch 2 (the 0->1 flip must retract the old cell); u20..u39 never
    val b1 = (0 until 40).map(i => (s"u$i", i < 10, ts("2024-01-01 00:00:01")))
    val b2 = (10 until 20).map(i => (s"u$i", true, ts("2024-01-01 00:00:02"))) ++
      Seq(("u0", true, ts("2024-01-01 00:00:02"))) // re-convert: no emission
    val mem = MemoryStream[(String, Boolean, java.sql.Timestamp)](spark)
    val query = StatefulOps.abCellsStream(
        mem.toDS().toDF("unit", "conv", "event_time"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("ab_cells")
      .outputMode("append").start()
    try {
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
    } finally query.stop()
    val folded = spark.table("ab_cells").as[StatefulOps.AbDelta]
      .groupBy("arm", "y").agg(sum("delta").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      .withDefaultValue(0L)
    // batch twin over the SAME union of events
    val all = (b1 ++ b2).toDF("unit", "conv", "event_time")
    val batch = graft.ops.Stats.abChiSquare(all, col("unit"), col("conv"))
      .collect().head
    val (a, b) = (folded((1L, 1L)), folded((1L, 0L)))
    val (c, d) = (folded((0L, 1L)), folded((0L, 0L)))
    assert(a + b == batch.getLong(0), s"n_treat: ${a + b} vs ${batch.getLong(0)}")
    assert(c + d == batch.getLong(1))
    assert(a == batch.getLong(2), s"conv_treat: $a vs ${batch.getLong(2)}")
    assert(c == batch.getLong(3))
    assert(a + c == 20L && a + b + c + d == 40L)
    // the shared readout tail over the folded cells = the batch readout
    val live = graft.ops.Stats.abReadoutFromCells(
        Seq((a, b, c, d)).toDF("a", "b", "c", "d")).collect().head
    assert(live == batch, s"live readout $live vs batch $batch")
  }

  test("kmvDistinctStream: drained sketch equals batch kmvDistinct bit for bit, across batches") {
    import org.apache.spark.sql.functions.col
    // key "small" stays under k (exact branch); key "big" exceeds k
    // (estimator branch); duplicates ensure n_rows > distinct
    val all = ((0 until 6).map(i => ("small", s"u${i % 3}")) ++
      (0 until 120).map(i => ("big", s"v${i % 60}"))).map {
      case (kk, item) => (kk, item, ts("2024-01-01 00:00:01"))
    }
    val mem = MemoryStream[(String, String, java.sql.Timestamp)](spark)
    val query = StatefulOps.kmvDistinctStream(
        mem.toDS().toDF("key", "item", "event_time"),
        k = 16, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("kmv_parity")
      .outputMode("append").start()
    try {
      // split ACROSS batches: min-k is order-independent, so the final
      // snapshot must not depend on the batching
      mem.addData(all.take(40)); query.processAllAvailable()
      mem.addData(all.drop(40)); query.processAllAvailable()
    } finally query.stop()
    // last snapshot per key = final sketch state
    val streamed = spark.table("kmv_parity").as[StatefulOps.KmvOut]
      .collect().groupBy(_.key)
      .map { case (kk, outs) => kk -> {
        val last = outs.maxBy(_.n_rows); (last.n_rows, last.est_distinct) } }
    val batch = graft.ops.Sketches.kmvDistinct(
        all.toDF("key", "item", "ts"), col("key"), col("item"), k = 16)
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(streamed == batch,
      s"drained sketch must equal the batch sketch: $streamed vs $batch")
    assert(batch("small")._2 == 3L, "exact branch expected under k")
    assert(batch("big")._1 == 120L && batch("big")._2 != 60L,
      s"estimator branch expected over k: ${batch("big")}")
  }

  test("embedNearDupHits: drained hits equal the batch banded rep-verify bit-for-bit") {
    import org.apache.spark.sql.functions._
    import graft.ext.SimSearch
    import graft.functions.VectorOps
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val th = 0.35
    val rows = emb.as[(Long, Array[Float])].collect().toSeq
      .map { case (id, v) => (id, v, ts("2024-01-01 00:00:00")) }
    val mem = MemoryStream[(Long, Array[Float], java.sql.Timestamp)](spark)
    val query = StatefulOps.embedNearDupHits(
        mem.toDS().toDF("vec_id", "embedding", "event_time"),
        threshold = th, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("embed_hits").outputMode("append").start()
    try { mem.addData(rows); query.processAllAvailable() } finally query.stop()
    val streamed = spark.table("embed_hits")
      .as[StatefulOps.VecHit].collect()
      .map(h => (h.id, h.band, h.first_id, h.cos_micro)).toSet

    // batch rebuild: per (band, bucket) the min id is the representative;
    // every later member is verified against it with the SAME double
    // expression the batch operator uses
    val bands = (0 until 4).map(b =>
      SimSearch.hyperplaneBucket(col("embedding"), dim = 64, numPlanes = 6, 42L + b))
    val bucketed = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
      posexplode(array(bands: _*)).as(Seq("band", "bucket")))
    val reps = bucketed.groupBy("band", "bucket")
      .agg(min(col("id")).as("first_id"))
    val expected = bucketed.join(reps, Seq("band", "bucket"))
      .filter(col("id") > col("first_id"))
      .join(bucketed.select(col("band"), col("bucket"),
        col("id").as("first_id"), col("v").as("fv")), Seq("band", "bucket", "first_id"))
      .withColumn("cos", VectorOps.dot(col("fv"), col("v"))
        / (VectorOps.norm(col("fv")) * VectorOps.norm(col("v"))))
      .filter(col("cos") >= th)
      .select(col("id"), col("band"), col("first_id"),
        floor(col("cos") * 1e6).cast("long").as("cos_micro"))
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture must produce banded hits at this threshold")
    assert(streamed == expected,
      s"streamed ${streamed.size} vs batch ${expected.size}; " +
        s"diff ${(streamed diff expected).take(3)} / ${(expected diff streamed).take(3)}")
  }

  test("ewmaStream: sub-second timestamps order on floor-seconds + ord like the batch twin") {
    // two events in the SAME second with millis order OPPOSITE to ord
    // order: the batch operator is driven on unix_timestamp (whole
    // seconds), so ord must win the tie — a raw-millis arrival sort
    // would process v=20 first and emit (20, 15) instead
    val t0 = ts("2024-01-01 00:00:00")
    val mem = MemoryStream[(Long, Long, Long, java.sql.Timestamp)](spark)
    val query = StatefulOps.ewmaStream(
        mem.toDS().toDF("user_id", "v", "ord", "event_time"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("ewma_subsec").outputMode("append").start()
    try {
      mem.addData(Seq(
        (1L, 10L, 1L, new java.sql.Timestamp(t0.getTime + 900L)),
        (1L, 20L, 2L, new java.sql.Timestamp(t0.getTime + 100L))))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("ewma_subsec").as[StatefulOps.EwmaOut]
      .collect().sortBy(_.ord).map(_.ewma).toList
    // ord order: 10 first -> 10, then (128*20+64*10)/192 = 16
    assert(got == List(10L, 16L), s"got $got")
  }

  test("ewmaStream: tail continues across batches; EwmaTail codec bytes pinned") {
    val mem = MemoryStream[(Long, Long, Long, java.sql.Timestamp)](spark)
    val query = StatefulOps.ewmaStream(
        mem.toDS().toDF("user_id", "v", "ord", "event_time"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("ewma_cont").outputMode("append").start()
    try {
      mem.addData(Seq((1L, 10L, 1L, ts("2024-01-01 00:00:00"))))
      query.processAllAvailable()
      mem.addData(Seq((1L, 20L, 2L, ts("2024-01-01 00:01:00"))))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("ewma_cont").as[StatefulOps.EwmaOut]
      .collect().sortBy(_.ord).map(_.ewma).toList
    // second batch must see the first batch's 10: (128*20+64*10)/192 = 16
    assert(got == List(10L, 16L), s"got $got")

    // v2 (current) layout: [n][recent…][horizon][nSeen] big-endian
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    val enc = StatefulOps.StateCodec.encodeEwma(
      StatefulOps.EwmaTail(List(7L, 9L), 1234L, nSeen = 5L))
    assert(enc.version == 2 && hex(enc.payload) ==
      "00000002" + "0000000000000007" + "0000000000000009" +
        "00000000000004d2" + "0000000000000005")
    assert(StatefulOps.StateCodec.decodeEwma(enc) ==
      StatefulOps.EwmaTail(List(7L, 9L), 1234L, 5L))
    // v1 GOLDEN BYTES still decode (nSeen defaults to 0 — the field
    // predates the layout), and the rolling-upgrade encoder still
    // WRITES them byte-identically
    val v1Bytes = {
      val b = java.nio.ByteBuffer.allocate(4 + 16 + 8)
      b.putInt(2).putLong(7L).putLong(9L).putLong(1234L); b.array()
    }
    assert(StatefulOps.StateCodec.decodeEwma(
        StatefulOps.VersionedState(1, v1Bytes)) ==
      StatefulOps.EwmaTail(List(7L, 9L), 1234L, 0L))
    val encV1 = StatefulOps.StateCodec.encodeEwma(
      StatefulOps.EwmaTail(List(7L, 9L), 1234L, nSeen = 5L), version = 1)
    assert(encV1.version == 1 && hex(encV1.payload) == hex(v1Bytes))
    assertThrows[IllegalStateException](
      StatefulOps.StateCodec.decodeEwma(StatefulOps.VersionedState(99, Array[Byte]())))
    // corrupt v2 (v1-sized payload under a v2 tag) is the runbook
    // failure, not an underflow
    assertThrows[IllegalStateException](
      StatefulOps.StateCodec.decodeEwma(StatefulOps.VersionedState(2, v1Bytes)))
  }

  test("ewmaStream: a v2 engine resumes a committed v1 checkpoint (upgrade drill, both providers)") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    for (provider <- Seq(None, Some(rocks))) {
      provider.foreach(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
      try {
        val in = Files.createTempDirectory("graft_ewma_in_")
        val out = Files.createTempDirectory("graft_ewma_out_").toString
        val chk = Files.createTempDirectory("graft_ewma_chk_").toString
        val schema = "user_id LONG, v LONG, ord LONG, event_time TIMESTAMP"
        def writeBatch(name: String,
            rows: Seq[(Long, Long, Long, java.sql.Timestamp)]): Unit =
          rows.toDF("user_id", "v", "ord", "event_time")
            .coalesce(1).write.parquet(s"$in/$name")
        def runOnce(version: Int): Unit = {
          val stream = spark.readStream.schema(schema)
            .option("latestFirst", "false").parquet(s"$in/*/")
          val query = StatefulOps.ewmaStream(stream,
              watermarkDelay = "10 minutes", stateVersion = version)
            .writeStream.format("json")
            .option("path", out).option("checkpointLocation", chk)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          query.awaitTermination(120000)
        }
        // run 1: the PREVIOUS engine (v1 state layout) smooths one value
        writeBatch("b1", Seq((1L, 10L, 1L, ts("2024-01-01 00:00:00"))))
        runOnce(version = 1)
        // run 2: the UPGRADED engine (v2 default) resumes that
        // checkpoint — the smoothing tail must CONTINUE (ewma parity
        // with an uninterrupted run), and the widened n_seen counter
        // restarts from the documented v1-decode default of 0
        writeBatch("b2", Seq(
          (1L, 20L, 2L, ts("2024-01-01 00:01:00")),
          (1L, 30L, 3L, ts("2024-01-01 00:01:01"))))
        runOnce(version = 2)
        val got = spark.read
          .schema("key LONG, ord LONG, ewma LONG, n_seen LONG")
          .json(s"$out/*.json").as[(Long, Long, Long, Long)].collect()
          .sortBy(_._2).map(r => (r._3, r._4)).toList
        // ewma: 10; (128*20+64*10)/192 = 16; (128*30+64*20+32*10)/224 = 24
        assert(got == List((10L, 1L), (16L, 1L), (24L, 2L)),
          s"provider=$provider got $got")
      } finally if (provider.isDefined)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("NULL event_time/event_type rows are dropped, never NPE the query (all stateful ops)") {
    // FIXTURES.md: the reference's watermark column is nullable and NULL
    // event_time must be tolerated — each op's per-group code dereferences
    // the timestamp (arrival sort, TTL horizon), so one NULL record
    // without the guard kills the whole streaming query.
    val nullTs: java.sql.Timestamp = null

    // funnelStream: NULL ts and NULL type interleaved with a live chain
    val fm = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val fq = StatefulOps.funnelStream(
        fm.toDS().toDF("user_id", "event_type", "event_time"),
        Seq("view", "click"), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("funnel_nulls").outputMode("append").start()
    try {
      fm.addData(Seq(
        (1L, "view", nullTs),
        (1L, null, ts("2024-01-01 00:00:30")),
        (1L, "view", ts("2024-01-01 00:01:00")),
        (1L, "click", ts("2024-01-01 00:02:00"))))
      fq.processAllAvailable()
    } finally fq.stop()
    assert(spark.table("funnel_nulls").as[StatefulOps.FunnelProgress]
      .collect().map(_.stage).sorted.toList == List(1L, 2L))

    // capPerKeyStream: the NULL-ts row takes no quota slot
    val qm = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val qq = StatefulOps.capPerKeyStream(
        qm.toDS().toDF("doc_id", "source", "event_time"), n = 2,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("quota_nulls").outputMode("append").start()
    try {
      qm.addData(Seq(
        (1L, "srcA", nullTs),
        (2L, "srcA", ts("2024-01-01 00:00:00")),
        (3L, "srcA", ts("2024-01-01 00:00:01"))))
      qq.processAllAvailable()
    } finally qq.stop()
    val verdicts = spark.table("quota_nulls").as[StatefulOps.QuotaVerdict]
      .collect().map(q => q.id -> q.accepted).toMap
    assert(verdicts == Map(2L -> true, 3L -> true), s"got $verdicts")

    // nearDupHits: NULL-ts twin is dropped; the live pair still flags
    val nm = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val text = "the quick brown fox jumps over the lazy dog tonight"
    val nq = StatefulOps.nearDupHits(
        nm.toDS().toDF("doc_id", "text", "event_time"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("neardup_nulls").outputMode("append").start()
    try {
      nm.addData(Seq(
        (1L, text, ts("2024-01-01 00:00:00")),
        (2L, text, nullTs),
        (3L, text, ts("2024-01-01 00:00:01"))))
      nq.processAllAvailable()
    } finally nq.stop()
    val hitIds = spark.table("neardup_nulls").as[StatefulOps.BandHit]
      .collect().map(_.id).distinct.toList
    assert(hitIds == List(3L), s"got $hitIds")

    // editDistHits: same contract on the FastSS path
    val em = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val eq = StatefulOps.editDistHits(
        em.toDS().toDF("doc_id", "text", "event_time"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("editdist_nulls").outputMode("append").start()
    try {
      em.addData(Seq(
        (1L, "alpha beta gamma", ts("2024-01-01 00:00:00")),
        (2L, "alpha beta gamma", nullTs),
        (3L, "alpha beta gamma", ts("2024-01-01 00:00:01"))))
      eq.processAllAvailable()
    } finally eq.stop()
    val sigHits = spark.table("editdist_nulls").as[StatefulOps.SigHit]
      .collect().map(h => (h.id, h.first_id)).distinct.toList
    assert(sigHits == List((3L, 1L)), s"got $sigHits")

    // embedNearDupHits: NULL-ts and NULL-vector twins are dropped; the
    // identical live vector still flags against the representative
    val vm = MemoryStream[(Long, Array[Float], java.sql.Timestamp)](spark)
    val vec = Array.tabulate(64)(i => (i + 1).toFloat / 64f)
    val vq = StatefulOps.embedNearDupHits(
        vm.toDS().toDF("vec_id", "embedding", "event_time"),
        threshold = 0.99, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("embed_nulls").outputMode("append").start()
    try {
      vm.addData(Seq(
        (1L, vec, ts("2024-01-01 00:00:00")),
        (2L, vec, nullTs),
        (3L, null.asInstanceOf[Array[Float]], ts("2024-01-01 00:00:01")),
        (4L, vec, ts("2024-01-01 00:00:02"))))
      vq.processAllAvailable()
    } finally vq.stop()
    val vecHits = spark.table("embed_nulls").as[StatefulOps.VecHit]
      .collect().map(h => (h.id, h.first_id, h.cos_micro)).distinct.toList
    // identical vectors: cos exactly 1.0 -> 1,000,000 micro
    assert(vecHits == List((4L, 1L, 1000000L)), s"got $vecHits")
  }

  test("kmvRollupStream: drained hierarchy equals batch kmvRollup bit for bit, across batches") {
    import org.apache.spark.sql.functions.col
    val k = 8
    // two l1 groups, three l2 leaves; "big" leaves exceed k (estimator
    // branch), "small" stays under (exact branch); duplicates everywhere
    val all = ((0 until 40).map(i => ("srcA", "s1", s"u${i % 20}")) ++
      (0 until 30).map(i => ("srcA", "s2", s"v${i % 6}")) ++
      (0 until 50).map(i => ("srcB", "s3", s"w${i % 25}"))).map {
      case (l1, l2, item) => (l1, l2, item, ts("2024-01-01 00:00:01"))
    }
    val mem = MemoryStream[(String, String, String, java.sql.Timestamp)](spark)
    val query = StatefulOps.kmvRollupStream(
        mem.toDS().toDF("l1", "l2", "item", "event_time"),
        k = k, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("rollup_parity")
      .outputMode("append").start()
    try {
      // min-k merge is order-independent: split across batches
      mem.addData(all.take(50)); query.processAllAvailable()
      mem.addData(all.drop(50)); query.processAllAvailable()
    } finally query.stop()
    // final snapshot per (lvl, l1, l2) = max n_rows
    val outs = spark.table("rollup_parity").as[StatefulOps.KmvRollupOut].collect()
    val streamed = outs.groupBy(o => (o.lvl, o.l1, o.l2))
      .map { case (kk, os) => kk -> {
        val last = os.maxBy(_.n_rows); (last.n_rows, last.est_distinct) } }
    val batch = graft.ops.Sketches.kmvRollup(
        all.toDF("l1", "l2", "item", "ts"),
        col("l1"), col("l2"), col("item"), k = k)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2))) -> ((r.getLong(3), r.getLong(4)))).toMap
    // lvl 2 + lvl 1 emitted by the stream directly
    streamed.foreach { case ((lvl, l1, l2), got) =>
      assert(batch((lvl, Some(l1), l2)) == got,
        s"(${lvl}, $l1, $l2): streamed $got vs batch ${batch((lvl, Some(l1), l2))}")
    }
    assert(streamed.size == 5, s"3 leaves + 2 mids expected: ${streamed.keys}")
    // lvl 0: the downstream bounded fold over the final lvl-1 sketches
    // (merge-not-rescan) must equal the batch top row
    val finalMids = outs.filter(_.lvl == 1L).groupBy(_.l1)
      .map { case (_, os) => os.maxBy(_.n_rows) }
    val topHs = finalMids.flatMap(_.hs).toSeq.distinct.sorted.take(k)
    val topEst = if (topHs.length < k) topHs.length.toLong
      else ((k - 1).toLong * 4294967296L) / topHs.last
    val topN = finalMids.map(_.n_rows).sum
    assert(batch((0L, None, None)) == ((topN, topEst)),
      s"lvl0 fold ($topN, $topEst) vs batch ${batch((0L, None, None))}")
    // estimator branch must actually engage somewhere
    assert(streamed.exists { case ((lvl, _, _), (n, est)) => lvl == 2L && est != n })

    // v1 codec: roundtrip + unknown-version runbook
    val enc = StatefulOps.StateCodec.encodeRollup(StatefulOps.RollupState(
      List(StatefulOps.RollupLeaf("s1", List(3L, 9L), 5L)), 777L))
    assert(enc.version == 1)
    assert(StatefulOps.StateCodec.decodeRollup(enc) == StatefulOps.RollupState(
      List(StatefulOps.RollupLeaf("s1", List(3L, 9L), 5L)), 777L))
    assertThrows[IllegalStateException](
      StatefulOps.StateCodec.decodeRollup(StatefulOps.VersionedState(99, Array[Byte]())))
  }

  test("quantileGridStream: drained grid equals batch Stats.pooledGrid bit for bit, across batches") {
    import org.apache.spark.sql.functions.col
    // skewed scores with heavy ties and negatives
    val scores = (0 until 90).map(i => ((i * i * 7) % 101 - 13).toLong)
    val all = scores.zipWithIndex.map { case (v, i) =>
      ("quality", v, ts("2024-01-01 00:00:01")) }
    val mem = MemoryStream[(String, Long, java.sql.Timestamp)](spark)
    val query = StatefulOps.quantileGridStream(
        mem.toDS().toDF("key", "score", "event_time"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("grid_parity")
      .outputMode("append").start()
    try {
      mem.addData(all.take(40)); query.processAllAvailable()
      mem.addData(all.drop(40)); query.processAllAvailable()
    } finally query.stop()
    val outs = spark.table("grid_parity").as[StatefulOps.QuantileGridOut].collect()
    val nFinal = outs.map(_.n).max
    assert(nFinal == 90L, s"final pooled count must be 90: $nFinal")
    val streamed = outs.filter(_.n == nFinal)
      .map(o => o.g -> o.norm_score).toMap
    val batch = graft.ops.Stats.pooledGrid(
        scores.toDF("score"), col("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed.size == 1001 && batch.size == 1001)
    assert(streamed == batch,
      s"grid diverges at ${streamed.collect { case (g, v) if batch(g) != v => (g, v, batch(g)) }.take(5)}")
    // a mid-stream snapshot exists too (the live-normalization surface)
    assert(outs.exists(_.n == 40L), "first batch must emit its snapshot")

    // v1 codec: roundtrip + unknown-version runbook
    val enc = StatefulOps.StateCodec.encodeGrid(
      StatefulOps.GridHist(List((-2L, 3L), (7L, 1L)), 4L, 555L))
    assert(enc.version == 1)
    assert(StatefulOps.StateCodec.decodeGrid(enc) ==
      StatefulOps.GridHist(List((-2L, 3L), (7L, 1L)), 4L, 555L))
    assertThrows[IllegalStateException](
      StatefulOps.StateCodec.decodeGrid(StatefulOps.VersionedState(99, Array[Byte]())))
  }

  test("holtWintersStream: drained forecast equals batch bit for bit under reordering") {
    import org.apache.spark.sql.functions.col
    // two keys, uneven day counts over 10 days (m=3 season), events
    // deliberately DELIVERED OUT OF DAY ORDER across two batches — the
    // day-histogram fold must make arrival order irrelevant
    // 2024 base: event times at epoch ~0 collide with the INITIAL
    // watermark (0 ms) and get late-dropped — a fixture hazard, not an
    // operator property
    def at(day: Int, i: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    val counts = Map(
      "a" -> Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3),
      "b" -> Seq(2, 7, 1, 8, 2, 8, 1, 0, 4, 5)) // a zero day -> gap fill
    val all = counts.toSeq.flatMap { case (k, cs) =>
      cs.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(i => (k, at(d, i))) }
    }
    // shuffle deterministically: interleave late days first
    val shuffled = all.sortBy { case (k, t) => ((t.getTime / 1000 + 3) % 7, k) }
    val mem = MemoryStream[(String, java.sql.Timestamp)](spark)
    val query = StatefulOps.holtWintersStream(
        mem.toDS().toDF("key", "event_time"),
        // the delivery order spans DAYS backwards: a tight watermark
        // would late-drop batch-2 rows before the state fn sees them —
        // reordering robustness is the fold's job, lateness policy is
        // the caller's (the lateStream accounting op exists for that)
        m = 3, horizon = 4, watermarkDelay = "30 days")
      .writeStream.format("memory").queryName("hw_parity")
      .outputMode("append").start()
    try {
      mem.addData(shuffled.take(40)); query.processAllAvailable()
      mem.addData(shuffled.drop(40)); query.processAllAvailable()
    } finally query.stop()
    val outs = spark.table("hw_parity").as[StatefulOps.HoltWintersOut].collect()
    val finals = outs.groupBy(_.key).map { case (k, rows) =>
      val n = rows.map(_.n_events).max
      k -> rows.filter(_.n_events == n)
        .map(r => r.h -> ((r.n_days, r.level_milli, r.trend_milli,
          r.season_milli, r.sae_milli, r.forecast_milli))).toMap
    }
    val batchDf = all.toDF("k", "ts")
    val batch = graft.ops.TimeSeries.holtWintersForecast(
        batchDf, col("k"), col("ts"), m = 3, horizon = 4)
      .collect().groupBy(_.getString(0)).map { case (k, rows) =>
      k -> rows.map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    }
    assert(finals == batch, s"stream $finals\nbatch $batch")
    // a mid-stream snapshot exists once a key crosses m+1 days
    assert(outs.exists(o => o.n_events < counts(o.key).sum),
      "first batch must emit a live snapshot")
  }

  test("acfStream: drained ACF block equals batch acfPpm bit for bit under reordering") {
    import org.apache.spark.sql.functions.col
    // same fixture family as the Holt-Winters pin: day-histogram fold,
    // events delivered out of day order across two batches
    def at(day: Int, i: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    val counts = Map(
      "a" -> Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3),
      "b" -> Seq(2, 7, 1, 8, 2, 8, 1, 0, 4, 5),
      "c" -> Seq(2, 2, 2, 2, 2, 2)) // constant series -> NULL acf_ppm
    val all = counts.toSeq.flatMap { case (k, cs) =>
      cs.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(i => (k, at(d, i))) }
    }
    val shuffled = all.sortBy { case (k, t) => ((t.getTime / 1000 + 3) % 7, k) }
    val mem = MemoryStream[(String, java.sql.Timestamp)](spark)
    val query = StatefulOps.acfStream(
        mem.toDS().toDF("key", "event_time"),
        maxLag = 3, watermarkDelay = "30 days")
      .writeStream.format("memory").queryName("acf_parity")
      .outputMode("append").start()
    try {
      mem.addData(shuffled.take(40)); query.processAllAvailable()
      mem.addData(shuffled.drop(40)); query.processAllAvailable()
    } finally query.stop()
    val outs = spark.table("acf_parity").as[StatefulOps.AcfOut].collect()
    val finals = outs.groupBy(_.key).map { case (k, rows) =>
      val n = rows.map(_.n_events).max
      k -> rows.filter(_.n_events == n)
        .map(r => r.lag -> ((r.n_days, r.acf_ppm))).toMap
    }
    val batch = graft.ops.TimeSeries.acfPpm(
        all.toDF("k", "ts"), col("k"), col("ts"), maxLag = 3)
      .collect().groupBy(_.getString(0)).map { case (k, rows) =>
      k -> rows.map(r => r.getInt(1) -> ((r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    }
    assert(finals == batch, s"stream $finals\nbatch $batch")
    assert(finals("c").values.forall(_._2.isEmpty),
      "constant series must report NULL acf_ppm")
  }

  test("decayedPopularityStream: drained snapshot equals batch with the corpus anchor") {
    import org.apache.spark.sql.functions.col
    def at(day: Int, i: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    // key b STOPS four days before a: the batch anchor (corpus max day)
    // differs from b's own last day, so the explicit-anchor contract is
    // exercised, not just the trivially-shared case
    val counts = Map(
      "a" -> Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3),
      "b" -> Seq(2, 7, 1, 8, 2, 8))
    val all = counts.toSeq.flatMap { case (k, cs) =>
      cs.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(i => (k, at(d, i))) }
    }
    val shuffled = all.sortBy { case (k, t) => ((t.getTime / 1000 + 3) % 7, k) }
    val corpusMaxDay = 1704067200000L / 86400000L + 9L
    val mem = MemoryStream[(String, java.sql.Timestamp)](spark)
    val query = StatefulOps.decayedPopularityStream(
        mem.toDS().toDF("key", "event_time"),
        halfLifeDays = 2, anchorDay = Some(corpusMaxDay),
        watermarkDelay = "30 days")
      .writeStream.format("memory").queryName("decpop_parity")
      .outputMode("append").start()
    try {
      mem.addData(shuffled.take(30)); query.processAllAvailable()
      mem.addData(shuffled.drop(30)); query.processAllAvailable()
    } finally query.stop()
    val outs = spark.table("decpop_parity").as[StatefulOps.DecayedPopOut].collect()
    val finals = outs.groupBy(_.key).map { case (k, rows) =>
      val r = rows.maxBy(_.n_events)
      k -> ((r.n_events, r.last_day_age, r.decayed_ppm))
    }
    val batch = graft.ops.TimeSeries.decayedPopularity(
        all.toDF("k", "ts"), col("k"), col("ts"), halfLifeDays = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(finals == batch, s"stream $finals\nbatch $batch")
    // b's freshness is read against the CORPUS anchor: 4 days stale
    assert(finals("b")._2 == 4L, s"got ${finals("b")}")
  }

  test("mannKendallStream: drained trend test equals batch bit for bit under reordering") {
    import org.apache.spark.sql.functions.col
    def at(day: Int, i: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    val counts = Map(
      "a" -> Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12), // monotone: clears
      "b" -> Seq(3, 1, 4, 1, 5, 9, 2, 6),
      "c" -> Seq(2, 2, 2, 2)) // constant: var18 = 0 -> NULL z2
    val all = counts.toSeq.flatMap { case (k, cs) =>
      cs.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(i => (k, at(d, i))) }
    }
    val shuffled = all.sortBy { case (k, t) => ((t.getTime / 1000 + 3) % 7, k) }
    val mem = MemoryStream[(String, java.sql.Timestamp)](spark)
    val query = StatefulOps.mannKendallStream(
        mem.toDS().toDF("key", "event_time"), watermarkDelay = "30 days")
      .writeStream.format("memory").queryName("mk_parity")
      .outputMode("append").start()
    try {
      mem.addData(shuffled.take(50)); query.processAllAvailable()
      mem.addData(shuffled.drop(50)); query.processAllAvailable()
    } finally query.stop()
    val outs = spark.table("mk_parity").as[StatefulOps.MkOut].collect()
    val finals = outs.groupBy(_.key).map { case (k, rows) =>
      val r = rows.maxBy(_.n_events)
      k -> ((r.n_days, r.s_stat, r.var18, r.z2_signed_milli, r.significant))
    }
    val batch = graft.ops.TimeSeries.mannKendall(
        all.toDF("k", "ts"), col("k"), col("ts"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5)))).toMap
    assert(finals == batch, s"stream $finals\nbatch $batch")
    assert(finals("a")._5, "the monotone key must clear significance")
    assert(finals("c")._4.isEmpty, "constant series must report NULL z2")
  }

  test("crostonStream: drained intermittent forecast equals batch bit for bit") {
    import org.apache.spark.sql.functions.col
    def at(day: Int, i: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    // intermittent demand: mostly-zero days, exactly Croston's regime
    val counts = Map(
      "a" -> Seq(3, 0, 0, 2, 0, 0, 0, 5, 0, 1),
      "b" -> Seq(0, 4, 0, 0, 4)) // leading zero day never observed: the
      // span starts at b's first EVENT day, matching the batch operator
    val all = counts.toSeq.flatMap { case (k, cs) =>
      cs.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(i => (k, at(d, i))) }
    }
    val shuffled = all.sortBy { case (k, t) => ((t.getTime / 1000 + 5) % 5, k) }
    val mem = MemoryStream[(String, java.sql.Timestamp)](spark)
    val query = StatefulOps.crostonStream(
        mem.toDS().toDF("key", "event_time"), watermarkDelay = "30 days")
      .writeStream.format("memory").queryName("croston_parity")
      .outputMode("append").start()
    try {
      mem.addData(shuffled.take(10)); query.processAllAvailable()
      mem.addData(shuffled.drop(10)); query.processAllAvailable()
    } finally query.stop()
    val outs = spark.table("croston_parity").as[StatefulOps.CrostonOut].collect()
    val finals = outs.groupBy(_.key).map { case (k, rows) =>
      val r = rows.maxBy(_.n_events)
      k -> ((r.n_days, r.n_demand, r.z_milli, r.p_milli, r.forecast_milli))
    }
    val batch = graft.ops.TimeSeries.crostonForecast(
        all.toDF("k", "ts"), col("k"), col("ts"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(finals == batch, s"stream $finals\nbatch $batch")
  }
}
