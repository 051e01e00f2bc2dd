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
  * follows the standard idempotent-foreachBatch protocol, a
  * mini two-file manifest:
  *
  *  - each applied batch writes a fresh VERSION directory `v<batchId>`
  *    (never mutates the live one);
  *  - a `_current` marker file naming the live version is then swapped
  *    via rename — the atomic commit point (same FS contract as
  *    `IncrementalDedup.compactIndex`: atomic on HDFS/local/ABFS, NOT
  *    on S3A);
  *  - a batch id ≤ the marker's is a replay and is skipped wholesale;
  *  - versions older than the previous one are garbage-collected after
  *    the swap; a crash between data write and marker swap leaves the
  *    old version live and the orphan `v<batchId>` is simply
  *    overwritten when the batch replays.
  */
object DimensionSync {

  /** Read the live dimension (None before the first committed batch). */
  def currentDim(spark: SparkSession, dimDir: String): Option[DataFrame] =
    currentBatchId(spark, dimDir).map(id =>
      spark.read.parquet(s"$dimDir/v$id"))

  /** The last committed batch id (None before the first commit). */
  def currentBatchId(spark: SparkSession, dimDir: String): Option[Long] = {
    val (fs, marker) = fsAndMarker(spark, dimDir)
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        "UTF-8").trim.toLong)
      finally in.close()
    }
  }

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
    commitMarker(spark, dimDir, batchId, previous = last)
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

  /** Swap the `_current` marker to `batchId` via write-temp + rename
    * (the atomic commit), then GC the superseded version directory.
    */
  private def commitMarker(spark: SparkSession, dimDir: String,
                           batchId: Long, previous: Option[Long]): Unit = {
    val (fs, marker) = fsAndMarker(spark, dimDir)
    val tmp = new org.apache.hadoop.fs.Path(marker.getParent,
      marker.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    // rename-over requires the target absent on some FSs: drop then move;
    // a crash between the two replays this batch (data dir is intact and
    // Overwrite-healable, marker lands on the retry)
    if (fs.exists(marker)) fs.delete(marker, false)
    if (!fs.rename(tmp, marker)) throw new java.io.IOException(
      s"DimensionSync: rename $tmp -> $marker returned false; " +
        s"dimension data v$batchId intact, marker not committed")
    previous.foreach(old =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dimDir/v$old"), true))
  }

  private def fsAndMarker(spark: SparkSession, dimDir: String) = {
    val marker = new org.apache.hadoop.fs.Path(dimDir, "_current")
    (marker.getFileSystem(spark.sparkContext.hadoopConfiguration), marker)
  }
}
