package graft.jobs

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Behavior

class DimensionSyncSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("key", "valid_from", "attr")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect().toList

  private def dirNames(dimDir: String, prefix: String) =
    new java.io.File(dimDir).listFiles()
      .filter(_.getName.startsWith(prefix)).map(_.getName).sorted.toList

  test("streamed batches converge to the full-rebuild dimension") {
    val dimDir = Files.createTempDirectory("graft_dimsync_").toString + "/dim"
    val chk = Files.createTempDirectory("graft_dimsync_chk_").toString
    val mem = MemoryStream[(Long, Timestamp, String, Long)](spark)
    val stream = mem.toDF().toDF("user_id", "ts", "tier", "event_id")
    val query = DimensionSync.start(stream, dimDir, chk,
      col("user_id"), col("ts"), col("tier"), col("event_id"))
    val all = scala.collection.mutable.ArrayBuffer[(Long, Timestamp, String, Long)]()
    try {
      def feed(rows: (Long, Timestamp, String, Long)*): Unit = {
        all ++= rows; mem.addData(rows); query.processAllAvailable()
      }
      feed((1L, ts("2026-01-01 00:00:00"), "a", 1L),
        (2L, ts("2026-01-01 00:00:00"), "x", 2L))
      feed((1L, ts("2026-01-02 00:00:00"), "a", 3L), // repeat -> collapses
        (1L, ts("2026-01-03 00:00:00"), "b", 4L),
        (3L, ts("2026-01-03 00:00:00"), "n", 5L))     // new key mid-stream
      feed((2L, ts("2026-01-04 00:00:00"), "y", 6L))
    } finally query.stop()

    val live = DimensionSync.currentDim(spark, dimDir).get
    val rebuilt = Behavior.scdType2(
      all.toSeq.toDF("user_id", "ts", "tier", "event_id"),
      col("user_id"), col("ts"), col("tier"), col("event_id"))
    assert(canon(live) == canon(rebuilt))
    // GC keeps the live version plus ONE superseded (the reader grace
    // window); everything older is swept
    assert(dirNames(dimDir, "v") == List("v1", "v2"),
      s"expected live + one grace version: ${dirNames(dimDir, "v")}")
    assert(dirNames(dimDir, "_commit_") == List("_commit_1", "_commit_2"))
  }

  test("a replayed batch id is skipped; a crashed write heals on replay") {
    val dimDir = Files.createTempDirectory("graft_dimsync_rp_").toString + "/dim"
    def batch(rows: (Long, Timestamp, String, Long)*) =
      rows.toDF("user_id", "ts", "tier", "event_id")
    val cols = (col("user_id"), col("ts"), col("tier"), col("event_id"))

    assert(DimensionSync.applyBatch(dimDir, batch(
      (1L, ts("2026-01-01 00:00:00"), "a", 1L)), 0L,
      cols._1, cols._2, cols._3, cols._4))
    val after0 = canon(DimensionSync.currentDim(spark, dimDir).get)

    // at-least-once replay of batch 0 (even with DIFFERENT junk content):
    // skipped wholesale, dimension unchanged
    assert(!DimensionSync.applyBatch(dimDir, batch(
      (9L, ts("2026-01-09 00:00:00"), "junk", 99L)), 0L,
      cols._1, cols._2, cols._3, cols._4))
    assert(canon(DimensionSync.currentDim(spark, dimDir).get) == after0)

    // crash window A: batch 1's data dir exists but the commit marker
    // never landed — the replay overwrites the orphan and commits, and
    // the dimension history is INTACT (the marker protocol is
    // create-only, so no crash can make the manifest read as empty and
    // send a replay down the bootstrap-from-delta arm)
    batch((1L, ts("2026-01-02 00:00:00"), "b", 2L))
      .write.mode("overwrite").parquet(s"$dimDir/v1") // wrong/partial content
    assert(DimensionSync.currentBatchId(spark, dimDir).contains(0L))
    assert(DimensionSync.applyBatch(dimDir, batch(
      (1L, ts("2026-01-02 00:00:00"), "b", 2L)), 1L,
      cols._1, cols._2, cols._3, cols._4))
    assert(DimensionSync.currentBatchId(spark, dimDir).contains(1L))
    val live = canon(DimensionSync.currentDim(spark, dimDir).get)
    assert(live == List(
      (1L, "a", ts("2026-01-01 00:00:00"), Some(ts("2026-01-02 00:00:00")), false),
      (1L, "b", ts("2026-01-02 00:00:00"), None, true)))

    // crash window B: commit landed but GC never ran (simulate by
    // resurrecting an ancient version + marker) — the NEXT commit's
    // sweep collects everything <= id-2, not just the predecessor
    batch((9L, ts("2026-01-01 00:00:00"), "z", 9L))
      .write.mode("overwrite").parquet(s"$dimDir/v98")
    new java.io.File(s"$dimDir/_commit_98").delete() // ensure only the dir orphan
    assert(DimensionSync.applyBatch(dimDir, batch(
      (1L, ts("2026-01-03 00:00:00"), "c", 3L)), 100L,
      cols._1, cols._2, cols._3, cols._4))
    // everything <= 98 swept (v1, v98, their markers); only v100 remains
    assert(dirNames(dimDir, "v") == List("v100"),
      s"orphans <= id-2 must be swept: ${dirNames(dimDir, "v")}")
    assert(DimensionSync.currentBatchId(spark, dimDir).contains(100L))
  }
}
