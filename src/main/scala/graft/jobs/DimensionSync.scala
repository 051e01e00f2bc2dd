package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Behavior

/** Streaming SCD2 dimension maintenance — [[Behavior.scd2Apply]] in its
  * production harness: a change-event stream keeps a parquet dimension
  * table current through `foreachBatch`, one incremental merge per
  * micro-batch (O(delta + live keys) per batch, never O(history)).
  *
  * `foreachBatch` is AT-LEAST-ONCE: after a crash between the sink write
  * and the checkpoint commit, the SAME batch id replays. Replaying a
  * merge is NOT harmless here (a re-applied change event sits at its
  * key's high-water mark and `scd2Apply` correctly RAISES), so the sink
  * follows the standard idempotent-foreachBatch protocol, a mini
  * append-only manifest:
  *
  *  - each applied batch writes a fresh VERSION directory `v<batchId>`
  *    (never mutates the live one);
  *  - the commit point is the atomic CREATE of an empty
  *    `_commit_<batchId>` marker — never a delete-then-rename, whose
  *    crash window would leave NO marker and send the replay down the
  *    bootstrap (`scdType2`-from-delta) arm, silently dropping history.
  *    The live version is the MAX committed id, so extra markers from
  *    interrupted GC are harmless;
  *  - a batch id ≤ the max committed id is a replay and is skipped
  *    wholesale; a crash between data write and marker create leaves
  *    the old version live, and the orphan `v<batchId>` is overwritten
  *    when the batch replays;
  *  - GC after each commit removes versions AND markers with
  *    `id ≤ committed − 2`: the immediately superseded version survives
  *    one extra batch as a GRACE WINDOW for concurrent readers that
  *    resolved the previous marker ([[currentDim]] is lazy — the scan
  *    may run after the next commit), and versions orphaned by a crash
  *    between commit and GC are collected by the NEXT commit's sweep.
  */
object DimensionSync {

  /** Read the live dimension (None before the first committed batch).
    * Lazy like any DataFrame: execute it within one downstream batch —
    * the superseded version survives exactly one commit (grace window)
    * before GC collects it.
    */
  def currentDim(spark: SparkSession, dimDir: String): Option[DataFrame] =
    currentBatchId(spark, dimDir).map(id =>
      spark.read.parquet(s"$dimDir/v$id"))

  /** The last committed batch id = max `_commit_<id>` marker (None
    * before the first commit).
    */
  def currentBatchId(spark: SparkSession, dimDir: String): Option[Long] = {
    val (fs, dir) = fsAndDir(spark, dimDir)
    if (!fs.exists(dir)) None
    else {
      val ids = fs.listStatus(dir).map(_.getPath.getName)
        .collect { case CommitName(id) => id.toLong }
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  private val CommitName = "_commit_(\\d+)".r

  /** Apply ONE micro-batch idempotently (the `foreachBatch` body,
    * public so tests and backfills can drive it directly). Returns true
    * when the batch was applied, false when it was a skipped replay.
    */
  def applyBatch(
      dimDir: String,
      batch: DataFrame,
      batchId: Long,
      keyCol: Column,
      tsCol: Column,
      attrCol: Column,
      seqCol: Column
  ): Boolean = {
    val spark = batch.sparkSession
    val last = currentBatchId(spark, dimDir)
    if (last.exists(batchId <= _)) return false // replayed batch: committed already
    val updated = last match {
      case Some(id) => Behavior.scd2Apply(
        spark.read.parquet(s"$dimDir/v$id"), batch, keyCol, tsCol, attrCol, seqCol)
      case None => Behavior.scdType2(batch, keyCol, tsCol, attrCol, seqCol)
    }
    // fresh version dir (Overwrite heals an orphan from a crashed try)
    updated.write.mode(SaveMode.Overwrite).parquet(s"$dimDir/v$batchId")
    commit(spark, dimDir, batchId)
    true
  }

  /** Start the maintenance query over a change-event stream. */
  def start(
      changes: DataFrame,
      dimDir: String,
      checkpoint: String,
      keyCol: Column,
      tsCol: Column,
      attrCol: Column,
      seqCol: Column
  ): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(dimDir, batch, batchId, keyCol, tsCol, attrCol, seqCol)
        ()
      }
      .start()

  /** Atomic commit (empty-file create) + grace-window GC. A crash at
    * any point here is safe: before the create, the old version stays
    * live and the batch replays; after it, the replay is skipped and
    * any un-swept garbage is collected by the NEXT commit.
    */
  private def commit(spark: SparkSession, dimDir: String, batchId: Long): Unit = {
    val (fs, dir) = fsAndDir(spark, dimDir)
    fs.create(new org.apache.hadoop.fs.Path(dir, s"_commit_$batchId"), true).close()
    val VersionName = "v(\\d+)".r
    fs.listStatus(dir).map(_.getPath).foreach { p =>
      val staleId = p.getName match {
        case CommitName(id)  => Some(id.toLong)
        case VersionName(id) => Some(id.toLong)
        case _               => None
      }
      if (staleId.exists(_ <= batchId - 2)) fs.delete(p, true)
    }
  }

  private def fsAndDir(spark: SparkSession, dimDir: String) = {
    val dir = new org.apache.hadoop.fs.Path(dimDir)
    (dir.getFileSystem(spark.sparkContext.hadoopConfiguration), dir)
  }
}
