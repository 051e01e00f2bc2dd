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
    // guard BEFORE the append write: failing after it would leave the
    // batch on disk, and a foreachBatch retry would append it again on
    // every attempt (a poison batch duplicating data until intervention)
    val distinctParts = batch
      .select(partitionCols.map(org.apache.spark.sql.functions.col): _*).distinct()
    val parts = distinctParts.limit(maxPartitions + 1).collect()
    require(parts.length <= maxPartitions,
      s"batch touches > $maxPartitions partition directories; " +
        "refusing to collect the partition list to the driver for _SUCCESS " +
        "markers — repartition time or use Spark's _spark_metadata commit log")
    batch.write.mode("append").partitionBy(partitionCols: _*).json(path)
    parts.foreach { r =>
      val dir = partitionCols.zipWithIndex
        .map { case (c, i) => s"$c=${r.get(i)}" }.mkString("/")
      val marker = Paths.get(path, dir, "_SUCCESS")
      if (Files.exists(marker.getParent)) {
        Files.write(marker, Array.emptyByteArray)
      }
    }
  }
}
