package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus publishing: size-bounded, range-sorted shard layout — the
  * output half of a 100 TB pipeline. Two failure modes dominate real
  * publishes and both are layout, not compute: the SMALL-FILES problem
  * (one file per shuffle partition × thousands of partitions starves
  * downstream listings and NameNode/manifest metadata) and UNSORTED
  * shards (parquet zone maps / row-group min-max can't skip anything,
  * so every downstream range or id-prefix read rescans the corpus).
  */
object CorpusWriter {

  /** Plan the shard layout: repartition by RANGE of `sortCol` into
    * `ceil(rows / targetRowsPerFile)` partitions and sort within each —
    * every output file then covers a disjoint `sortCol` range (its
    * parquet footer min/max prunes reads), file count tracks corpus
    * size instead of shuffle width, and `maxRecordsPerFile` backstops
    * range skew by splitting any oversized partition.
    *
    * Returned as a DataFrame (caller picks `.write.parquet(...)` /
    * `.json(...)` and options) so the layout is testable and reusable
    * across formats. `rowCount` is accepted from the caller when
    * already known — passing it avoids the extra count job.
    *
    * Scale: one range shuffle (sampled boundaries — Spark's
    * `repartitionByRange` samples, it does not sort globally) + local
    * sorts. Deterministic for a deterministic input and fixed
    * `targetRowsPerFile`.
    */
  def shardPlan(
      df: DataFrame,
      sortCol: Column,
      targetRowsPerFile: Long,
      rowCount: Option[Long] = None
  ): DataFrame = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val rows = rowCount.getOrElse(df.count())
    df.repartitionByRange(plannedFiles(rows, targetRowsPerFile), sortCol)
      .sortWithinPartitions(sortCol)
  }

  /** ceil(rows / target), failing LOUDLY past Int.MaxValue partitions —
    * a silent .toInt wrap at that scale would plan a garbage partition
    * count far from the real cause (raise the target instead; even 2³¹
    * files is far past any sane manifest).
    */
  def plannedFiles(rows: Long, targetRowsPerFile: Long): Int = {
    val n = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile)
    require(n <= Int.MaxValue,
      s"$n planned files exceeds Int.MaxValue — raise targetRowsPerFile")
    n.toInt
  }

  /** [[shardPlan]] + parquet write with the `maxRecordsPerFile`
    * backstop. Returns the planned file count (the actual count can
    * exceed it only when range skew trips the backstop).
    *
    * `mode` defaults to `ErrorIfExists` — a publishing API must not
    * silently destroy an existing corpus drop; pass
    * `SaveMode.Overwrite` explicitly to replace one.
    */
  def writeSharded(
      df: DataFrame,
      path: String,
      sortCol: Column,
      targetRowsPerFile: Long,
      rowCount: Option[Long] = None,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.ErrorIfExists
  ): Int = {
    val rows = rowCount.getOrElse(df.count())
    val nFiles = plannedFiles(rows, targetRowsPerFile)
    shardPlan(df, sortCol, targetRowsPerFile, Some(rows)).write
      .option("maxRecordsPerFile", targetRowsPerFile)
      .mode(mode)
      .parquet(path)
    nFiles
  }
}
