package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** S4 — partitioned filesystem JSON sink (SURVEY.md §2.1).
  *
  * Mirrors the reference's S3 sink table (`PythonKafkaSink/main.py:59-76`):
  * JSON-lines files under Hive-style `year=/month=/day=/hour=` directories
  * (`PARTITIONED BY`, `main.py:69`). Exactly-once via Spark's
  * `_spark_metadata` commit log (the Flink analog is checkpoint-based
  * partition commit, `main.py:74-75`).
  *
  * The reference additionally drops a `_SUCCESS` marker per partition with a
  * 1-minute commit delay (`'sink.partition-commit.policy.kind'='success-file'`,
  * `'sink.partition-commit.delay'='1 min'`, `main.py:74-75`). Spark's
  * streaming file sink has no partition-commit policy, so byte-compatible
  * layout is offered through [[withSuccessMarkers]] (foreachBatch path,
  * SURVEY.md §7.4 item 3).
  */
object PartitionedJsonSink {
  val partitionCols: Seq[String] = Seq("year", "month", "day", "hour") // main.py:69

  def writer(df: DataFrame, path: String, checkpointDir: String): DataStreamWriter[Row] =
    df.writeStream
      .format("json")
      .partitionBy(partitionCols: _*)
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")

  /** Max partition tuples one micro-batch may touch before the marker pass
    * refuses to collect them to the driver. The reference layout is
    * year/month/day/hour — a batch spanning even a full year is ~8.8k
    * directories — so the bound only trips when a caller repurposes the
    * sink with a high-cardinality partition key.
    */
  val MaxMarkerPartitions: Int = 10000

  /** Batch-side helper used by the foreachBatch fan-out: write one
    * micro-batch partition-dir-compatible with the reference layout and drop
    * `_SUCCESS` markers in every partition directory touched.
    *
    * The marker pass `collect()`s the DISTINCT partition tuples of the
    * batch — bounded by directory count, not row count, and guarded by
    * [[MaxMarkerPartitions]] so a high-cardinality partitioning fails fast
    * instead of OOM-ing the driver.
    */
  def writeBatchWithSuccessMarkers(batch: DataFrame, path: String,
                                   maxPartitions: Int = MaxMarkerPartitions): Unit = {
    // the guard and the append are two actions over the same micro-batch
    // plan — persist so an expensive upstream (joins, dedup) executes
    // once, not once per action; released in `finally` either way
    val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // guard BEFORE the append write: failing after it would leave the
      // batch on disk, and a foreachBatch retry would append it again on
      // every attempt (a poison batch duplicating data until intervention)
      val distinctParts = pinned
        .select(partitionCols.map(org.apache.spark.sql.functions.col): _*).distinct()
      val parts = distinctParts.limit(maxPartitions + 1).collect()
      require(parts.length <= maxPartitions,
        s"batch touches > $maxPartitions partition directories; " +
          "refusing to collect the partition list to the driver for _SUCCESS " +
          "markers — repartition time or use Spark's _spark_metadata commit log")
      pinned.write.mode("append").partitionBy(partitionCols: _*).json(path)
      parts.foreach { r =>
        val dir = partitionCols.zipWithIndex
          .map { case (c, i) => s"$c=${r.get(i)}" }.mkString("/")
        val marker = Paths.get(path, dir, "_SUCCESS")
        if (Files.exists(marker.getParent)) {
          Files.write(marker, Array.emptyByteArray)
        }
      }
    } finally pinned.unpersist()
  }

  /** [[writeBatchWithSuccessMarkers]] with the reference's partition-commit
    * DELAY (`'sink.partition-commit.delay'='1 min'` + success-file policy,
    * `main.py:74-75`) under the STRONGER `partition-time` trigger: the
    * batch's rows are appended immediately, but a partition directory
    * earns its `_SUCCESS` marker only once `watermark` has passed the
    * partition's hour END plus `delayMinutes` — i.e. the partition can no
    * longer receive late rows, which is exactly what the marker promises
    * downstream consumers. Note the reference config sets only the delay
    * and policy; Flink's default `sink.partition-commit.trigger` is
    * `process-time`, so the reference as written commits on processing
    * time since partition creation. This implements the watermark-driven
    * semantics the reference would get by also setting
    * `'sink.partition-commit.trigger'='partition-time'` — a strictly
    * stronger guarantee (markers never precede the late-data horizon).
    * Partitions still open are re-examined by every later call
    * ([[commitClosedPartitions]] scans directories on disk, not just the
    * batch's), so a partition written in batch N is marked by the first
    * batch whose watermark clears it — matching Flink, where the commit
    * trigger is watermark progress, not the write that filled the
    * partition.
    *
    * `watermark` comes from the caller (in `foreachBatch`, track
    * `query.lastProgress.eventTime` or derive max-event-time − delay from
    * the batch); partition hours are interpreted in UTC, matching the
    * UTC-session date-part projections that produced the columns.
    */
  def writeBatchWithDelayedMarkers(batch: DataFrame, path: String,
                                   watermark: java.sql.Timestamp,
                                   delayMinutes: Long = 1L,
                                   maxPartitions: Int = MaxMarkerPartitions): Unit = {
    val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val guard = pinned
        .select(partitionCols.map(org.apache.spark.sql.functions.col): _*).distinct()
        .limit(maxPartitions + 1).collect()
      require(guard.length <= maxPartitions,
        s"batch touches > $maxPartitions partition directories; " +
          "refusing the batch before the append write (poison-batch guard)")
      pinned.write.mode("append").partitionBy(partitionCols: _*).json(path)
    } finally pinned.unpersist()
    commitClosedPartitions(path, watermark, delayMinutes)
  }

  /** Drop `_SUCCESS` into every on-disk `year=/month=/day=/hour=`
    * directory whose hour window ended at least `delayMinutes` before
    * `watermark` and that is not marked yet. Idempotent; returns the
    * number of markers written. Listing cost is bounded by directory
    * count (~8.8k dirs per year of data), not rows.
    */
  def commitClosedPartitions(path: String, watermark: java.sql.Timestamp,
                             delayMinutes: Long): Int = {
    import scala.jdk.CollectionConverters._
    // a dir whose value does not parse as an Int (a stray dir, or
    // `hour=__HIVE_DEFAULT_PARTITION__` from a null event time) must be
    // SKIPPED, not thrown on: this runs after the batch append, so a
    // deterministic throw would make every foreachBatch retry re-append
    // the batch — the poison-batch loop the pre-append guard exists to stop
    def intValue(p: java.nio.file.Path): Option[Int] =
      scala.util.Try(p.getFileName.toString.split("=", 2)(1).toInt).toOption
    def children(p: java.nio.file.Path, prefix: String): Seq[java.nio.file.Path] =
      if (!Files.isDirectory(p)) Seq.empty
      else {
        val s = Files.list(p)
        try s.iterator().asScala.filter(c =>
          Files.isDirectory(c) && c.getFileName.toString.startsWith(prefix + "=") &&
            intValue(c).isDefined).toList
        finally s.close()
      }
    var marked = 0
    for {
      y <- children(Paths.get(path), "year")
      m <- children(y, "month")
      d <- children(m, "day")
      h <- children(d, "hour")
      if !Files.exists(h.resolve("_SUCCESS"))
      // out-of-range values (month=13) would throw in LocalDateTime.of —
      // same post-append hazard as unparseable dirs, so skip those too
      hourEnd <- scala.util.Try(java.time.LocalDateTime
        .of(intValue(y).get, intValue(m).get, intValue(d).get, intValue(h).get, 0)
        .plusHours(1)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli).toOption
    } {
      if (hourEnd + delayMinutes * 60000L <= watermark.getTime) {
        Files.write(h.resolve("_SUCCESS"), Array.emptyByteArray)
        marked += 1
      }
    }
    marked
  }
}
