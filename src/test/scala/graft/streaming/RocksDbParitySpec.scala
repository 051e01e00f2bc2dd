package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.core.Telemetry

/** State-store provider matrix for the GroupState streaming twins (the
  * round-16 verdict item): `sessionizeTws` already pins RocksDB, but the
  * `mapGroupsWithState`/`flatMapGroupsWithState` twins ran only on the
  * default HDFS provider. Each scenario here drains the SAME stream
  * twice — once per provider — and asserts the outputs are IDENTICAL;
  * `StatefulOpsSpec` pins default-provider ≡ batch, so transitivity
  * gives RocksDB ≡ batch without re-deriving the batch twins. Where the
  * key domain is known, per-key state is asserted BOUNDED via the
  * engine's own progress metrics (`stateOperators.numRowsTotal` ≤ live
  * keys — the GroupState contract that state is one row per key, on
  * both providers).
  */
class RocksDbParitySpec extends SparkTestBase {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Drain `batches` through `op` under the given provider; returns the
    * memory-sink rows (rendered, order-insensitive) and the final
    * state-operator row counts.
    */
  private def drainWith[A <: Product : Encoder](
      provider: Option[String],
      cols: Seq[String],
      op: DataFrame => DataFrame,
      batches: Seq[Seq[A]],
      qname: String): (Seq[String], Seq[Long]) = {
    provider.foreach(spark.conf.set(ProviderKey, _))
    try {
      val mem = MemoryStream[A](spark)
      val query = op(mem.toDS().toDF(cols: _*))
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      val stateRows =
        try {
          batches.foreach { b => mem.addData(b); query.processAllAvailable() }
          Option(query.lastProgress).toSeq
            .flatMap(_.stateOperators.map(_.numRowsTotal))
        } finally query.stop()
      (spark.table(qname).collect().map(_.toString).sorted.toSeq, stateRows)
    } finally if (provider.isDefined) spark.conf.unset(ProviderKey)
  }

  /** The matrix row: default-provider drain ≡ RocksDB drain (+ bounded
    * state on both).
    */
  private def parity[A <: Product : Encoder](
      name: String,
      cols: Seq[String],
      op: DataFrame => DataFrame,
      batches: Seq[Seq[A]],
      maxStateRows: Option[Long] = None): Unit = {
    val (hdfs, stHdfs) = drainWith(None, cols, op, batches, s"${name}_hdfs")
    val (rocks, stRocks) = drainWith(Some(RocksDb), cols, op, batches, s"${name}_rdb")
    assert(hdfs.nonEmpty, s"$name: scenario must emit rows")
    assert(hdfs == rocks,
      s"$name: provider outputs diverge (${hdfs.size} vs ${rocks.size} rows); " +
        s"hdfs-only=${(hdfs diff rocks).take(3)} rocks-only=${(rocks diff hdfs).take(3)}")
    maxStateRows.foreach { m =>
      assert(stHdfs.forall(_ <= m), s"$name hdfs state rows $stHdfs > $m")
      assert(stRocks.forall(_ <= m), s"$name rocksdb state rows $stRocks > $m")
    }
  }

  test("capPerKeyStream parity + bounded state (3 keys)") {
    val rows = (0 until 60).map { i =>
      ((i * 37 % 60).toLong, s"src${i % 3}", ts(f"2024-01-01 00:00:${i % 7}%02d"))
    }
    parity("rdbm_quota", Seq("doc_id", "source", "event_time"),
      df => StatefulOps.capPerKeyStream(df, n = 5, watermarkDelay = "10 minutes").toDF(),
      Seq(rows.take(30), rows.drop(30)), maxStateRows = Some(3L))
  }

  test("ewmaStream parity + bounded state (5 keys)") {
    val rows = (0 until 80).map { i =>
      ((i * 31 % 5).toLong, ((i * 17 % 37) - 7).toLong, i.toLong,
        ts(f"2024-01-01 00:${i * 13 % 60}%02d:${i * 7 % 60}%02d"))
    }
    parity("rdbm_ewma", Seq("user_id", "v", "ord", "event_time"),
      df => StatefulOps.ewmaStream(df, watermarkDelay = "10 minutes").toDF(),
      Seq(rows.take(40), rows.drop(40)), maxStateRows = Some(5L))
  }

  test("cusumStream parity + bounded state (3 keys)") {
    val rows = (0 until 60).map { i =>
      ((i % 3).toLong, ((i * 23 % 41) - 5).toLong, i.toLong,
        ts(f"2024-01-01 00:${i * 11 % 60}%02d:${i * 5 % 60}%02d"))
    }
    parity("rdbm_cusum", Seq("user_id", "v", "ord", "event_time"),
      df => StatefulOps.cusumStream(df, target = 8L, slack = 2L, threshold = 30L,
        watermarkDelay = "10 minutes").toDF(),
      Seq(rows.take(25), rows.drop(25)), maxStateRows = Some(3L))
  }

  test("hygieneStream parity + bounded state (3 keys)") {
    val rows = (0 until 60).map { i =>
      ((i % 3).toLong, ((i * 37) % 53).toLong,
        ts(f"2024-01-01 00:${(i * 11) % 30}%02d:${(i * 7) % 30}%02d"))
    }
    parity("rdbm_hyg", Seq("user_id", "ord", "event_time"),
      df => StatefulOps.hygieneStream(df, watermarkDelay = "10 minutes").toDF(),
      Seq(rows.take(30), rows.drop(30)), maxStateRows = Some(3L))
  }

  test("lateStream parity + bounded state (2 keys)") {
    val rows = Seq(
      (1L, 0L, ts("2024-01-01 00:00:10")),
      (1L, 1L, ts("2024-01-01 00:00:07")),
      (1L, 2L, ts("2024-01-01 00:00:30")),
      (1L, 3L, ts("2024-01-01 00:00:02")),
      (1L, 4L, ts("2024-01-01 00:00:21")),
      (2L, 5L, ts("2024-01-01 00:00:01")),
      (2L, 6L, ts("2024-01-01 00:00:02")))
    parity("rdbm_late", Seq("user_id", "ord", "event_time"),
      df => StatefulOps.lateStream(df, delayMs = 5000L,
        watermarkDelay = "10 minutes").toDF(),
      Seq(rows.take(4), rows.drop(4)), maxStateRows = Some(2L))
  }

  test("abCellsStream parity across a retraction fold (40 unit keys)") {
    val b1 = (0 until 40).map(i => (s"u$i", i < 10, ts("2024-01-01 00:00:01")))
    val b2 = (10 until 20).map(i => (s"u$i", true, ts("2024-01-01 00:00:02"))) ++
      Seq(("u0", true, ts("2024-01-01 00:00:02")))
    parity("rdbm_ab", Seq("unit", "conv", "event_time"),
      df => StatefulOps.abCellsStream(df, watermarkDelay = "10 minutes").toDF(),
      Seq(b1, b2), maxStateRows = Some(40L))
  }

  test("kmvDistinctStream parity + bounded state (2 keys, O(k) sketches)") {
    val all = ((0 until 6).map(i => ("small", s"u${i % 3}")) ++
      (0 until 120).map(i => ("big", s"v${i % 60}"))).map {
      case (kk, item) => (kk, item, ts("2024-01-01 00:00:01"))
    }
    parity("rdbm_kmv", Seq("key", "item", "event_time"),
      df => StatefulOps.kmvDistinctStream(df, k = 16,
        watermarkDelay = "10 minutes").toDF(),
      Seq(all.take(40), all.drop(40)), maxStateRows = Some(2L))
  }

  test("holtWintersStream parity + bounded state (2 keys)") {
    val all = (0 until 72).map { i =>
      (s"k${i % 2}",
        new java.sql.Timestamp(1704067200000L + (i * 29 % 9) * 86400000L + i * 1000L))
    }
    parity("rdbm_hw", Seq("key", "event_time"),
      df => StatefulOps.holtWintersStream(df, m = 3, horizon = 3,
        watermarkDelay = "30 days").toDF(),
      Seq(all.take(36), all.drop(36)), maxStateRows = Some(2L))
  }

  test("acfStream parity + bounded state (2 keys)") {
    val all = (0 until 72).map { i =>
      (s"k${i % 2}",
        new java.sql.Timestamp(1704067200000L + (i * 29 % 9) * 86400000L + i * 1000L))
    }
    parity("rdbm_acf", Seq("key", "event_time"),
      df => StatefulOps.acfStream(df, maxLag = 3,
        watermarkDelay = "30 days").toDF(),
      Seq(all.take(36), all.drop(36)), maxStateRows = Some(2L))
  }

  test("decayedPopularityStream parity + bounded state (2 keys)") {
    val all = (0 until 72).map { i =>
      (s"k${i % 2}",
        new java.sql.Timestamp(1704067200000L + (i * 29 % 9) * 86400000L + i * 1000L))
    }
    parity("rdbm_decpop", Seq("key", "event_time"),
      df => StatefulOps.decayedPopularityStream(df, halfLifeDays = 2,
        watermarkDelay = "30 days").toDF(),
      Seq(all.take(36), all.drop(36)), maxStateRows = Some(2L))
  }

  test("mannKendallStream parity + bounded state (2 keys)") {
    val all = (0 until 72).map { i =>
      (s"k${i % 2}",
        new java.sql.Timestamp(1704067200000L + (i * 29 % 9) * 86400000L + i * 1000L))
    }
    parity("rdbm_mk", Seq("key", "event_time"),
      df => StatefulOps.mannKendallStream(df,
        watermarkDelay = "30 days").toDF(),
      Seq(all.take(36), all.drop(36)), maxStateRows = Some(2L))
  }

  test("crostonStream parity + bounded state (2 keys)") {
    val all = (0 until 40).map { i =>
      (s"k${i % 2}",
        new java.sql.Timestamp(1704067200000L + (i * 31 % 11) * 86400000L + i * 1000L))
    }
    parity("rdbm_croston", Seq("key", "event_time"),
      df => StatefulOps.crostonStream(df,
        watermarkDelay = "30 days").toDF(),
      Seq(all.take(20), all.drop(20)), maxStateRows = Some(2L))
  }

  test("funnelStream parity (8 user keys)") {
    val rows = (0 until 120).map { i =>
      val u = (i * 31 % 8).toLong
      val et = Seq("view", "click", "purchase", "error")(i * 17 % 4)
      (u, et, ts(f"2024-01-01 00:${i * 13 % 60}%02d:${i * 7 % 60}%02d"))
    }
    parity("rdbm_funnel", Seq("user_id", "event_type", "event_time"),
      df => StatefulOps.funnelStream(df, Seq("view", "click", "purchase"),
        watermarkDelay = "10 minutes").toDF(),
      Seq(rows.take(60), rows.drop(60)), maxStateRows = Some(8L))
  }

  test("nearDupHits parity across batches") {
    val doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val far = "one two three four five six seven eight nine ten"
    val b1 = Seq((0L, doc, ts("2024-01-01 00:00:00")), (3L, far, ts("2024-01-01 00:00:01")))
    val b2 = Seq((1L, doc, ts("2024-01-01 00:01:00")), (2L, near, ts("2024-01-01 00:01:01")))
    parity("rdbm_neardup", Seq("doc_id", "text", "event_time"),
      df => StatefulOps.nearDupHits(df, watermarkDelay = "10 minutes").toDF(),
      Seq(b1, b2))
  }

  test("editDistHits parity") {
    val docs = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta gamma delta"),
      (12L, "alpha beta gamma zeta"),
      (13L, "totally different words here"),
      (14L, "alpha beta gamma delta extra"))
    val rows = docs.map { case (i, t) => (i, t, ts("2024-01-01 00:00:00")) }
    parity("rdbm_editdist", Seq("doc_id", "text", "event_time"),
      df => StatefulOps.editDistHits(df, maxDist = 10L,
        watermarkDelay = "10 minutes").toDF(),
      Seq(rows.take(3), rows.drop(3)))
  }

  test("embedNearDupHits parity on hand-built vectors") {
    def vec(seed: Int): Array[Float] = {
      val rnd = new java.util.Random(seed)
      Array.fill(64)(rnd.nextFloat() - 0.5f)
    }
    def nudge(v: Array[Float]): Array[Float] =
      v.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val base = vec(1)
    val rows = Seq(
      (1L, base, ts("2024-01-01 00:00:00")),
      (2L, nudge(base), ts("2024-01-01 00:00:01")), // near-dup of 1
      (3L, vec(2), ts("2024-01-01 00:00:02")),
      (4L, vec(2), ts("2024-01-01 00:00:03"))) // exact dup of 3
    parity("rdbm_embed", Seq("vec_id", "embedding", "event_time"),
      df => StatefulOps.embedNearDupHits(df, threshold = 0.9,
        watermarkDelay = "10 minutes").toDF(),
      Seq(rows.take(2), rows.drop(2)))
  }

  test("sessionize (flatMapGroupsWithState) parity across providers") {
    val b1 = Seq(
      Telemetry("s1", 30, ts("2024-01-01 00:00:00")),
      Telemetry("s1", 30, ts("2024-01-01 00:00:10")))
    val b2 = Seq(Telemetry("s1", 30, ts("2024-01-01 00:02:00")))
    val b3 = Seq(Telemetry("s2", 30, ts("2024-01-01 00:10:00")))
    val b4 = Seq(Telemetry("s2", 30, ts("2024-01-01 00:20:00")))
    parity[Telemetry]("rdbm_sess", Seq("sensor_id", "temperature", "event_time"),
      df => {
        import org.apache.spark.sql.functions.col
        StatefulOps.sessionize(
          df.select(col("sensor_id"), col("temperature"), col("event_time"))
            .as[Telemetry], gapMs = 30000L).toDF()
      },
      Seq(b1, b2, b3, b4), maxStateRows = Some(2L))
  }

  test("dedupWithinWatermark parity") {
    val rows = Seq(
      (1L, "k1", ts("2024-01-01 00:00:00")),
      (2L, "k1", ts("2024-01-01 00:00:01")), // dup key inside horizon
      (3L, "k2", ts("2024-01-01 00:00:02")))
    parity("rdbm_dedup", Seq("id", "k", "event_time"),
      df => {
        import org.apache.spark.sql.functions.col
        StatefulOps.dedupWithinWatermark(
          df.withWatermark("event_time", "10 minutes"), Seq("k"))
          .select(col("k"))
      },
      Seq(rows.take(2), rows.drop(2)))
  }
}
